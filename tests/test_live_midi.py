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


# ---- ALSA sequencer port model (frontends/seq_midi.py) ----
# CI has no sound subsystem, so a synthetic in-process sequencer stands
# in for libasound: same ctypes surface, scripted events.

import ctypes

from skred_tpu.frontends.seq_midi import (AlsaSeqInput, SeqEvent,
                                          format_ports, list_ports,
                                          seq_event_to_midi)
from skred_tpu.frontends import seq_midi as SM


def _note_ev(t, ch, note, vel):
    ev = SeqEvent()
    ev.type = t
    ev.data.note.channel = ch
    ev.data.note.note = note
    ev.data.note.velocity = vel
    return ev


def _ctrl_ev(t, ch, param, value):
    ev = SeqEvent()
    ev.type = t
    ev.data.control.channel = ch
    ev.data.control.param = param
    ev.data.control.value = value
    return ev


class FakeSeqLib:
    """Synthetic snd_seq_* surface: scripted event queue + port table."""

    def __init__(self, events=(), clients=()):
        self.events = list(events)
        self.clients = list(clients)   # (cid, name, [(pid, pname, caps)])
        self.connected = []
        self.created_ports = []
        self.client_name = None
        self.closed = 0

    def snd_seq_open(self, seqref, name, streams, mode):
        seqref._obj.value = 0x5E0
        return 0

    def snd_seq_set_client_name(self, seq, name):
        self.client_name = bytes(name)
        return 0

    def snd_seq_create_simple_port(self, seq, name, caps, ptype):
        self.created_ports.append((bytes(name), caps, ptype))
        return 0

    def snd_seq_client_id(self, seq):
        return 128

    def snd_seq_connect_from(self, seq, port, c, p):
        self.connected.append((c, p))
        return 0

    def snd_seq_event_input(self, seq, evref):
        if not self.events:
            return -11                 # EAGAIN-ish: bridge sees EOF
        self._live = self.events.pop(0)
        evref._obj.contents = self._live
        return 1

    def snd_seq_close(self, seq):
        self.closed += 1
        return 0

    # ---- enumeration (cursor state lives here, not in the buffers) ----
    def snd_seq_client_info_sizeof(self):
        return 64

    def snd_seq_port_info_sizeof(self):
        return 64

    def snd_seq_client_info_set_client(self, buf, c):
        self._ci = -1

    def snd_seq_query_next_client(self, seq, buf):
        self._ci += 1
        return 0 if self._ci < len(self.clients) else -1

    def snd_seq_client_info_get_client(self, buf):
        return self.clients[self._ci][0]

    def snd_seq_client_info_get_name(self, buf):
        return self.clients[self._ci][1].encode()

    def snd_seq_port_info_set_client(self, buf, cid):
        self._pc = cid

    def snd_seq_port_info_set_port(self, buf, p):
        self._pi = -1

    def snd_seq_query_next_port(self, seq, buf):
        ports = dict((c, ps) for c, _, ps in self.clients)[self._pc]
        self._pi += 1
        return 0 if self._pi < len(ports) else -1

    def _port(self):
        return dict((c, ps) for c, _, ps in self.clients)[self._pc][self._pi]

    def snd_seq_port_info_get_port(self, buf):
        return self._port()[0]

    def snd_seq_port_info_get_name(self, buf):
        return self._port()[1].encode()

    def snd_seq_port_info_get_capability(self, buf):
        return self._port()[2]


def test_seq_event_conversion_quirks():
    # crossmidi.c:76-130 conversion, quirks preserved: NoteOn vel 0 and
    # KEYPRESS both emit an 0x80 status (the 0x10 OR happens only for
    # NOTEON with velocity, crossmidi.c:82-84)
    assert seq_event_to_midi(_note_ev(SM.EV_NOTEON, 2, 69, 100)) == \
        bytes([0x92, 69, 100])
    assert seq_event_to_midi(_note_ev(SM.EV_NOTEON, 2, 69, 0)) == \
        bytes([0x82, 69, 0])
    assert seq_event_to_midi(_note_ev(SM.EV_NOTEOFF, 2, 69, 64)) == \
        bytes([0x82, 69, 64])
    assert seq_event_to_midi(_note_ev(SM.EV_KEYPRESS, 1, 60, 33)) == \
        bytes([0x81, 60, 33])
    assert seq_event_to_midi(_ctrl_ev(SM.EV_CONTROLLER, 0, 7, 99)) == \
        bytes([0xB0, 7, 99])
    assert seq_event_to_midi(_ctrl_ev(SM.EV_PGMCHANGE, 3, 0, 12)) == \
        bytes([0xC3, 12])
    assert seq_event_to_midi(_ctrl_ev(SM.EV_CHANPRESS, 3, 0, 55)) == \
        bytes([0xD3, 55])
    # pitchbend value 0 → center 8192 = (0x00, 0x40)
    assert seq_event_to_midi(_ctrl_ev(SM.EV_PITCHBEND, 0, 0, 0)) == \
        bytes([0xE0, 0x00, 0x40])
    assert seq_event_to_midi(_ctrl_ev(SM.EV_PITCHBEND, 0, 0, -8192)) == \
        bytes([0xE0, 0x00, 0x00])
    # subscription notices and unknown types are skipped
    assert seq_event_to_midi(_note_ev(SM.EV_PORT_SUBSCRIBED, 0, 0, 0)) is None
    ev = SeqEvent()
    ev.type = 0
    assert seq_event_to_midi(ev) is None
    # sysex passes through verbatim
    body = (ctypes.c_ubyte * 4)(0xF0, 1, 2, 0xF7)
    ev = SeqEvent()
    ev.type = SM.EV_SYSEX
    ev.data.ext.len = 4
    ev.data.ext.ptr = ctypes.cast(body, ctypes.c_void_p)
    assert seq_event_to_midi(ev) == bytes([0xF0, 1, 2, 0xF7])


def test_seq_input_bridge_end_to_end():
    """Synthetic sequencer client → AlsaSeqInput → MidiBridge → wire."""
    events = [
        _note_ev(SM.EV_PORT_SUBSCRIBED, 0, 0, 0),   # keyboard connects
        _note_ev(SM.EV_NOTEON, 2, 69, 100),
        _note_ev(SM.EV_NOTEON, 2, 69, 0),           # vel-0 off quirk
        _ctrl_ev(SM.EV_CONTROLLER, 2, 1, 64),       # CC: bridge logs only
        _note_ev(SM.EV_NOTEON, 2, 60, 90),
        _note_ev(SM.EV_NOTEOFF, 2, 60, 0),
    ]
    lib = FakeSeqLib(events)
    src = AlsaSeqInput(name="skred_tpu", connect=["20:0"], lib=lib)
    # the reference port model: a subscribable WRITE destination
    # (crossmidi.c:157-159) plus the requested any-source subscription
    assert lib.created_ports == [(b"skred_tpu",
                                  SM.SND_SEQ_PORT_CAP_WRITE
                                  | SM.SND_SEQ_PORT_CAP_SUBS_WRITE,
                                  SM.SND_SEQ_PORT_TYPE_APPLICATION
                                  | SM.SND_SEQ_PORT_TYPE_MIDI_GENERIC)]
    assert lib.connected == [(20, 0)]
    lines = []
    bridge = MidiBridge(src, lines.append)
    bridge.run()                                    # drains to EOF
    src.close()
    assert lines == ["v2 n69 l1", "v2 l0", "v2 n60 l1", "v2 l0"]
    assert lib.closed == 1


def test_seq_list_ports():
    lib = FakeSeqLib(clients=[
        (0, "System", [(0, "Timer", 0), (1, "Announce", 0)]),
        (20, "USB Keyboard", [(0, "MIDI 1",
                               SM.SND_SEQ_PORT_CAP_READ
                               | SM.SND_SEQ_PORT_CAP_SUBS_READ
                               | SM.SND_SEQ_PORT_CAP_WRITE)]),
    ])
    ports = list_ports(lib=lib)
    assert [(p["client"], p["port"]) for p in ports] == [(0, 0), (0, 1),
                                                         (20, 0)]
    srcs = [p for p in ports if p["source"]]
    assert len(srcs) == 1 and srcs[0]["client_name"] == "USB Keyboard"
    txt = format_ports(ports)
    assert "client 20: 'USB Keyboard'" in txt and "[source]" in txt
    assert txt.count("client ") == 2
    assert lib.closed == 1
