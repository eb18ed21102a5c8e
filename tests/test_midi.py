"""MIDI bridge: SMF parsing, cmex2 note mapping, timeline event track."""

import struct

import numpy as np

from skred_tpu.engine import render_timeline
from skred_tpu.frontends.midi import midi_events
from skred_tpu.host.timeline import compile_script


def _varlen(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


def make_test_midi(path):
    """One track: tempo 120bpm, ch0 note 69 at t=0 for 1 beat, ch1 note 60
    at beat 1 for half a beat."""
    division = 480
    ev = b""
    ev += _varlen(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
    ev += _varlen(0) + bytes([0x90, 69, 100])           # ch0 on
    ev += _varlen(480) + bytes([0x80, 69, 0])           # ch0 off @1 beat
    ev += _varlen(0) + bytes([0x91, 60, 90])            # ch1 on
    ev += _varlen(240) + bytes([0x81, 60, 0])           # ch1 off
    ev += _varlen(0) + bytes([0xFF, 0x2F, 0x00])        # end of track
    track = b"MTrk" + struct.pack(">I", len(ev)) + ev
    head = b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
    path.write_bytes(head + track)


def test_midi_events(tmp_path):
    f = tmp_path / "t.mid"
    make_test_midi(f)
    ev = midi_events(f)
    assert ev == [
        (0.0, "v0 n69 l1"),
        (0.5, "v0 l0"),
        (0.5, "v1 n60 l1"),
        (0.75, "v1 l0"),
    ]


def test_midi_render(tmp_path, reference_dir):
    f = tmp_path / "t.mid"
    make_test_midi(f)
    ev = midi_events(f)
    lines = ["v0 w0 a4 t0.005,0.05,0.7,0.2", "v1 w4 a4 t0.005,0.05,0.7,0.2"]
    tl = compile_script(lines, 1.5, script_dir=reference_dir, events=ev)
    audio = render_timeline(tl)
    rms = lambda a: float(np.sqrt((a.astype(np.float64) ** 2).mean()))
    # note sounding in [0.1, 0.4]s; both released long before 1.4s
    assert rms(audio[4410:17640]) > 1e-4
    assert rms(audio[-4410:]) < 1e-5
