"""UDP wire server and scope artifact tests."""

import socket
import time

import numpy as np

from skred_tpu.host import HostEngine
from skred_tpu.host.observe import scope_dump, system_show, wavetable_show
from skred_tpu.frontends.udp import UdpServer, _hash_addr


def test_udp_server_sessions(tmp_path):
    engine = HostEngine()
    rendered = {}

    def on_render(history, sec, out):
        rendered["history"] = list(history)
        rendered["sec"] = sec

    srv = UdpServer(engine, port=0, on_render=on_render)
    # bind to an ephemeral port
    srv.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.sock.bind(("127.0.0.1", 0))
    srv.sock.settimeout(0.2)
    port = srv.sock.getsockname()[1]
    srv.running = True
    import threading

    t = threading.Thread(target=srv._loop, daemon=True)
    t.start()
    try:
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        c.sendto(b"v3 w0 f220 a5", ("127.0.0.1", port))
        c.sendto(b"v4 a2", ("127.0.0.1", port))
        c.sendto(b".render 1.5 out.wav", ("127.0.0.1", port))
        deadline = time.time() + 3
        while time.time() < deadline and "history" not in rendered:
            time.sleep(0.05)
    finally:
        srv.stop()
    assert float(engine.amp[3]) == 5.0
    assert float(engine.freq[3]) == 220.0
    assert float(engine.amp[4]) == 2.0
    assert rendered["history"] == ["v3 w0 f220 a5", "v4 a2"]
    assert rendered["sec"] == 1.5


def test_udp_hash_stable():
    ip = socket.inet_aton("127.0.0.1")
    assert 0 <= _hash_addr(ip, 12345) < 127
    assert _hash_addr(ip, 12345) == _hash_addr(ip, 12345)


def test_observe_dumps(tmp_path):
    e = HostEngine()
    e.amp_set(0, 4.0)
    txt = system_show(e)
    assert "active voice count 1" in txt
    assert "w0 size:4096" in wavetable_show(e.bank, 0)
    audio = np.random.RandomState(0).randn(44100, 2).astype(np.float32) * 0.1
    scope_dump(audio, tmp_path / "scope.npz")
    z = np.load(tmp_path / "scope.npz")
    assert z["left_avg"].shape == (800,)
    assert (z["left_min"] <= z["left_max"]).all()


def test_scope_trigger_modes():
    from skred_tpu.host import observe as O

    t = np.arange(44100, dtype=np.float32) / 44100.0
    sig = 0.5 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    audio = np.stack([sig, sig], axis=-1)
    win = 512
    # zero-rising: the sample at the trigger must be > 0, its predecessor <= 0
    # the walk runs backward: "prev" is the later sample, so the trigger
    # lands where sample i is > 0 and the following sample is <= 0
    i = O.find_start_triggered(audio[:, 0], audio[:, 1], len(audio) - 1,
                               win, O.TRIGGER_ZERO_RISING)
    assert sig[i] > 0.0 and sig[i + 1] <= 0.0, i
    # hysteresis/slope need an adjacent-sample swing through +-0.02 (the
    # backward walk fires where a later sample < -0.02 follows an earlier
    # sample > 0.02) — a square wave has such edges, a smooth sine doesn't
    sq = np.where(sig >= 0, np.float32(0.4), np.float32(-0.4))
    sq_audio = np.stack([sq, sq], axis=-1)
    for mode in (O.TRIGGER_ZERO_RISING_HYST, O.TRIGGER_ZERO_SLOPE):
        i = O.find_start_triggered(sq_audio[:, 0], sq_audio[:, 1],
                                   len(sq) - 1, win, mode)
        assert sq[i] > 0.02 and sq[i + 1] < -0.02, (mode, i)
    # a smooth sine cannot satisfy the hysteresis jump: falls back
    assert O.find_start_triggered(audio[:, 0], audio[:, 1], len(audio) - 1,
                                  win, O.TRIGGER_ZERO_RISING_HYST) \
        == len(audio) - 1
    # peak: lands near a positive crest
    i = O.find_start_triggered(audio[:, 0], audio[:, 1], len(audio) - 1,
                               win, O.TRIGGER_PEAK)
    assert sig[i] > 0.45
    # none: no search
    assert O.find_start_triggered(audio[:, 0], audio[:, 1], 100, win,
                                  O.TRIGGER_NONE) == 100
    # a full aligned frame
    w = O.scope_window(audio, win, O.TRIGGER_ZERO_RISING)
    assert w.shape == (win, 2) and w[0, 0] > 0.0
    # two frames of a periodic signal trigger at the same waveform phase
    w2 = O.scope_window(audio, win, O.TRIGGER_ZERO_RISING,
                        write_ptr=len(audio) - 3000)
    assert abs(float(w[0, 0]) - float(w2[0, 0])) < 0.02


def test_controllers():
    from skred_tpu.frontends.controllers import (PadGrid, Slider, adsr_text,
                                                 amper, note_cycle,
                                                 timed_to_script)

    sent = []
    s = amper(send=sent.append)
    assert s.set(5.0) == "a5"
    assert s.set(99.0) == "a20"          # clamped to fire's max
    assert sent == ["a5", "a20"]
    assert Slider(0, 1, 0.00001, "c1,%s").set(0.5) == "c1,0.5"

    pad = PadGrid(["[v0l1]", "[v0l0]"], pattern=3)
    assert pad.toggle(0) == "[v0l1]"
    assert pad.toggle(0) == "[p3 .0]"    # release clears the pattern slot

    assert adsr_text(0.2, 0.1, 0.2, 0.5) == "E.2,.1,.2,.5"
    notes = note_cycle()
    assert notes[0] == "[ v0 n21 v1 n21.2 ]"


def test_timed_capture_renders(reference_dir):
    """A captured live session compiles and renders offline through the
    defer queue, reproducing the timing deterministically."""
    from skred_tpu.engine import render_timeline
    from skred_tpu.frontends.controllers import timed_to_script
    from skred_tpu.host.timeline import compile_script

    events = [(0.0, "v0 w0 f220 a2"), (0.25, "f330"), (0.5, "a0")]
    lines = timed_to_script(events)
    tl = compile_script(lines, 1.0)
    out = render_timeline(tl)
    n = (len(out) // 4410) * 4410
    sec = np.abs(out[:n, 0]).reshape(-1, 4410).max(axis=1)
    assert sec[0] > 0.01                    # sounding at start
    assert sec[-1] < 1e-6                   # silent after a0


def test_tcp_server_plain_lines():
    """Plain TCP client: newline-terminated wire text, replies echoed as
    lines (reference tcp_server.c line mode, on_line callback)."""
    from skred_tpu.frontends.tcp import TcpWireServer

    engine = HostEngine()
    srv = TcpWireServer(engine, port=0)
    port = srv.start()
    try:
        c = socket.create_connection(("127.0.0.1", port), timeout=3)
        c.sendall(b"v5 w0 f330 a7\n?\n")
        buf = b""
        deadline = time.time() + 5
        while time.time() < deadline and b"f330" not in buf:
            try:
                buf += c.recv(4096)
            except socket.timeout:
                break
        c.close()
    finally:
        srv.stop()
    assert float(engine.freq[5]) == 330.0
    assert float(engine.amp[5]) == 7.0
    # '?' dumps the current voice state as replayable wire text
    assert b"v5" in buf and b"f330" in buf


def test_tcp_server_websocket():
    """WebSocket client: RFC-6455 handshake + masked text frame in,
    unmasked text frame out (reference tcp_server.c:59-180)."""
    import base64
    import hashlib

    from skred_tpu.frontends.tcp import TcpWireServer, ws_accept_key

    engine = HostEngine()
    srv = TcpWireServer(engine, port=0)
    port = srv.start()
    try:
        c = socket.create_connection(("127.0.0.1", port), timeout=3)
        key = base64.b64encode(b"0123456789abcdef").decode()
        c.sendall((f"GET /wire HTTP/1.1\r\nHost: x\r\n"
                   f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                   f"Sec-WebSocket-Key: {key}\r\n"
                   f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        resp = b""
        deadline = time.time() + 5
        while time.time() < deadline and b"\r\n\r\n" not in resp:
            resp += c.recv(4096)
        assert b"101" in resp
        assert ws_accept_key(key).encode() in resp
        # masked client text frame: "v6 a3" then "?"
        def frame(text):
            payload = text.encode()
            mask = b"\x01\x02\x03\x04"
            masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
            return bytes((0x81, 0x80 | len(payload))) + mask + masked

        c.sendall(frame("v6 w0 f550 a3"))
        c.sendall(frame("?"))
        buf = b""
        deadline = time.time() + 5
        while time.time() < deadline and b"f550" not in buf:
            try:
                buf += c.recv(4096)
            except socket.timeout:
                break
        c.close()
    finally:
        srv.stop()
    assert float(engine.freq[6]) == 550.0
    assert float(engine.amp[6]) == 3.0
    # reply came back as an unmasked text frame containing the state dump
    assert buf[:1] == b"\x81"
    assert b"f550" in buf
