"""Live MIDI bridge: synthetic byte stream → wire → engine state.

Covers the reference's crossmidi/cmex2 path (crossmidi.c:354 port →
cmex2.c:46-63 mapping → udp_send) without hardware: a pipe stands in
for the ALSA port, the real UDP server receives the wire lines, and the
session renders through the timeline compiler like any capture.
"""

import os
import socket
import threading
import time

import numpy as np

from skred_tpu.frontends.live_midi import (MidiBridge, MidiByteParser,
                                           StreamMidiInput, cmex2_wire)


def test_parser_running_status_and_realtime():
    p = MidiByteParser()
    stream = bytes([
        0x90, 60, 100,          # NoteOn ch0
        62, 0x7F,               # running status NoteOn ch0 (no status byte)
        0xF8,                   # MIDI clock interleaved — ignored
        60, 0,                  # running status, velocity 0 = NoteOff
        0x80, 62, 64,           # explicit NoteOff
        0xF0, 1, 2, 3, 0xF7,    # sysex skipped
        0xB0, 7, 99,            # CC (parsed, maps to None)
    ])
    msgs = list(p.feed(stream))
    assert msgs == [bytes([0x90, 60, 100]), bytes([0x90, 62, 0x7F]),
                    bytes([0x90, 60, 0]), bytes([0x80, 62, 64]),
                    bytes([0xB0, 7, 99])]


def test_parser_incremental_chunks():
    p = MidiByteParser()
    stream = bytes([0x91, 65, 80, 65, 0])
    msgs = []
    for i in range(len(stream)):          # one byte at a time
        msgs += list(p.feed(stream[i:i + 1]))
    assert msgs == [bytes([0x91, 65, 80]), bytes([0x91, 65, 0])]


def test_cmex2_mapping():
    # cmex2.c:46-63: channel is the voice, note rides n, l1/l0 gate
    assert cmex2_wire(bytes([0x90, 60, 100])) == "v0 n60 l1"
    assert cmex2_wire(bytes([0x93, 72, 1])) == "v3 n72 l1"
    assert cmex2_wire(bytes([0x90, 60, 0])) == "v0 l0"
    assert cmex2_wire(bytes([0x82, 60, 64])) == "v2 l0"
    assert cmex2_wire(bytes([0xB0, 7, 99])) is None       # CC: log only
    assert cmex2_wire(bytes([0xE0, 0, 64])) is None       # pitchbend
    assert cmex2_wire(bytes([0x90, 60, 100]), voice_offset=4) == "v4 n60 l1"


def test_bridge_pipe_to_udp_engine(tmp_path):
    """End to end: pipe bytes → bridge → UDP server → engine state."""
    from skred_tpu.frontends.udp import UdpServer
    from skred_tpu.host import HostEngine

    engine = HostEngine()
    srv = UdpServer(engine, script_dir=tmp_path, port=0)
    srv.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.sock.bind(("127.0.0.1", 0))
    srv.sock.settimeout(0.2)
    port = srv.sock.getsockname()[1]
    srv.running = True
    t = threading.Thread(target=srv._loop, daemon=True)
    t.start()

    r, w = os.pipe()
    from skred_tpu.frontends.controllers import WireClient

    client = WireClient("127.0.0.1", port)
    bridge = MidiBridge(StreamMidiInput(r), client.send)
    pump = threading.Thread(target=bridge.run, daemon=True)
    pump.start()
    try:
        # a short performance: ch2 notes with running status
        os.write(w, bytes([0x92, 69, 100]))         # v2 n69 l1 (A4)
        os.write(w, bytes([69, 0]))                 # v2 l0
        os.write(w, bytes([0x92, 60, 90]))          # v2 n60 l1
        os.close(w)
        pump.join(timeout=3)
        deadline = time.time() + 3
        while time.time() < deadline and len(srv.history) < 3:
            time.sleep(0.02)
    finally:
        srv.stop()
        client.close()
    assert bridge.sent == 3
    assert srv.history == ["v2 n69 l1", "v2 l0", "v2 n60 l1"]
    # engine heard the keyboard: last note is C4 (midi 60), gate open
    from skred_tpu.assets.bank import midi2hz_f32

    assert float(engine.freq[2]) == float(midi2hz_f32(60))
    assert int(engine.env_active[2]) == 1


def test_bridge_history_renders(tmp_path, reference_dir):
    """A captured performance round-trips to audio: the bridge's wire
    lines + a patch prefix compile and render like any script."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from skred_tpu.assets import WaveBank
    from skred_tpu.engine import render_timeline
    from skred_tpu.host.timeline import compile_script

    lines = ["v2 w0 a4", "v2 n69 l1"]
    tl = compile_script(lines, 0.5, bank=WaveBank(), script_dir=tmp_path)
    audio = render_timeline(tl)
    assert np.isfinite(audio).all() and np.abs(audio).max() > 0
