"""Pixel scope export: raster geometry, reference color swap, PNG file.

Reference behavior: scope.c:272-341 (800x480 raylib draw loop, dot per
pixel column, 128-alpha traces, DARKGREEN axis, the left-yellow /
right-cyan channel color swap at scope.c:328/338) and the wav2data
D-array format (wav2data.c:17-26).
"""

import pathlib
import struct
import zlib

import numpy as np

from skred_tpu.frontends.scope_px import (HEIGHT, WIDTH, render_pixels,
                                          scope_frames, write_png)


def _sine(n, period=100, amp=1.0):
    t = np.arange(n)
    s = amp * np.sin(2 * np.pi * t / period).astype(np.float32)
    return np.stack([s, s], axis=-1)


def test_render_pixels_geometry_and_colors():
    img = render_pixels(_sine(WIDTH))
    assert img.shape == (HEIGHT, WIDTH, 3) and img.dtype == np.uint8
    # zero axis: DARKGREEN across the middle (where no trace covers it)
    mid = img[HEIGHT // 2]
    assert (mid[:, 1] > 0).all()            # green component everywhere
    # reference color swap: LEFT channel draws yellow (R+G), no blue —
    # checked off the axis row, where traces blend over its dark green
    off_axis = np.ones(HEIGHT, bool)
    off_axis[HEIGHT // 2] = False
    only_l = render_pixels(_sine(WIDTH), show_r=False)[off_axis]
    trace = only_l[only_l[:, :, 0] > 0]     # red pixels = the trace
    assert len(trace) > 0
    assert (trace[:, 2] == 0).all()         # yellow: zero blue
    # RIGHT channel draws cyan (G+B), no red
    only_r = render_pixels(_sine(WIDTH), show_l=False)[off_axis]
    rows, cols = np.nonzero(only_r[:, :, 2] > 0)
    assert len(rows) > 0
    assert (only_r[rows, cols, 0] == 0).all()   # cyan: zero red


def test_render_pixels_y_orientation():
    # positive sample draws BELOW the axis (raylib y grows downward)
    w = np.zeros((WIDTH, 2), np.float32)
    w[:, 0] = 0.5
    img = render_pixels(w, show_r=False)
    rows = np.nonzero(img[:, :, 0] > 0)[0]
    assert rows.min() > HEIGHT // 2


def test_write_png_roundtrip(tmp_path: pathlib.Path):
    img = render_pixels(_sine(WIDTH), gain=0.8)
    out = tmp_path / "scope.png"
    write_png(out, img)
    raw = out.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR carries the geometry
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (WIDTH, HEIGHT)
    # IDAT inflates to H rows of 1 filter byte + W*3 pixels
    idat_at = raw.index(b"IDAT")
    ln = struct.unpack(">I", raw[idat_at - 4:idat_at])[0]
    flat = zlib.decompress(raw[idat_at + 4:idat_at + 4 + ln])
    assert len(flat) == HEIGHT * (1 + WIDTH * 3)
    row0 = np.frombuffer(flat[1:1 + WIDTH * 3], np.uint8).reshape(WIDTH, 3)
    assert np.array_equal(row0, img[0])


def test_scope_frames_filmstrip():
    chunks = [_sine(4410, period=50) for _ in range(10)]
    frames = scope_frames(iter(chunks), 3, frame_every=11025)
    assert len(frames) == 3
    assert all(f.shape == (HEIGHT, WIDTH, 3) for f in frames)
    # trigger lock: consecutive frames of a steady tone rasterize
    # near-identically (same trigger phase)
    assert (frames[1] == frames[2]).mean() > 0.95


def test_wav2data_format(tmp_path: pathlib.Path):
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from skred_tpu.assets.bank import write_wav_16
    from tools.wav2data import wav_to_data

    audio = _sine(11, period=7, amp=0.5)
    wav = tmp_path / "t.wav"
    write_wav_16(wav, audio)
    txt = wav_to_data(wav)
    lines = txt.splitlines()
    assert lines[0] == "D11"
    assert lines[1].startswith("( ")
    assert txt.endswith(" ) \n")
    # 5 values per line (wav2data.c COLS), %.8f each
    body = txt[txt.index("( ") + 2:txt.rindex(" ) ")]
    vals = body.split()
    assert len(vals) == 11
    assert all("." in v and len(v.split(".")[1]) == 8 for v in vals)
    # the miniwav ch=-1 quirk: value 0 is frame 1 (frame 0 dropped) and
    # the final value reads past the end -> 0.0
    assert float(vals[-1]) == 0.0
    # parses through the skode reader as a data array of the right size
    import skred_tpu.lang.skode as sk

    arrays = []

    def cb(s, info):
        if info == sk.GOT_ARRAY:
            arrays.append(list(s.data))
        return 0

    p = sk.Skode(cb)
    p.set_global([0.0] * 10)
    p.feed(txt)          # stream feed: arrays span lines (skode.c:283)
    assert arrays and len(arrays[0]) == 11
