"""Live scope viewer: rasterizer, ring, trigger lock, animation loop.

Reference behavior: scope.c:168-375 (raylib 60 fps window over the
shared-memory ring, keyboard trigger modes/zoom).
"""

import io

import numpy as np

from skred_tpu.frontends.scope_view import (ScopeRing, ScopeViewer, animate,
                                            render_frame)
from skred_tpu.host.observe import TRIGGER_NONE, TRIGGER_ZERO_RISING


def _sine(n, period=100, amp=1.0, phase=0.0):
    t = np.arange(n)
    s = amp * np.sin(2 * np.pi * (t / period) + phase).astype(np.float32)
    return np.stack([s, s], axis=-1)


def test_render_frame_shape_and_axis():
    f = render_frame(_sine(400), rows=11, cols=40)
    assert len(f) == 11 and all(len(r) == 40 for r in f)
    # zero axis drawn on the middle row
    assert "-" in f[5]
    # full-scale sine touches top and bottom rows
    assert any(c in "|#:" for c in f[0])
    assert any(c in "|#:" for c in f[10])


def test_render_frame_channel_toggle():
    w = _sine(400)
    w[:, 1] = 0.0                      # right channel silent
    f = render_frame(w, rows=9, cols=30, show_l=False, show_r=True)
    assert not any("|" in r for r in f)          # left hidden
    f2 = render_frame(w, rows=9, cols=30, show_l=True, show_r=False)
    assert any("|" in r for r in f2)


def test_ring_wraps_and_counts():
    ring = ScopeRing(size=1000)
    for _ in range(5):
        ring.push(_sine(300))
    assert ring.total == 1500
    assert ring.write_ptr == 500
    assert np.abs(ring.buf).max() > 0


def test_trigger_locks_window():
    """With the zero trigger, consecutive frames of a continuous periodic
    signal start at the same phase (the scope's whole point).  Reference
    semantics (scope.c:119-121): scanning BACKWARD from the write
    pointer, trigger where prev <= 0 < cur — so the window starts just
    above zero heading down in time order."""
    N = 4410
    long = _sine(N * 26, period=100)                # one continuous tone
    v = ScopeViewer(rows=9, cols=40, mode=TRIGGER_ZERO_RISING, window=200)
    starts = []
    for k in range(26):
        v.step(long[N * k:N * (k + 1)])
        if v.ring.total <= len(v.ring.buf):
            continue                    # steady state only (ring wrapped)
        w = v.ring.window(v.window, v.mode)
        starts.append(float(w[0, 0]))
        assert abs(float(w[0, 0])) <= 0.07          # at the zero crossing
        assert float(w[2, 0]) < float(w[0, 0])      # descending through it
    assert len(starts) >= 4
    # locked: every frame starts within one sample of the same phase
    assert max(starts) - min(starts) <= 0.07


def test_keys_change_modes_and_zoom():
    v = ScopeViewer()
    assert v.handle_key("v") and v.mode == 4
    assert v.handle_key("b") and v.mode == TRIGGER_NONE
    w0 = v.window
    v.handle_key("+")
    assert v.window == w0 // 2
    v.handle_key("1")
    assert not v.show_l
    assert not v.handle_key("q")


def test_animate_over_stream():
    """The animation loop consumes a chunk stream and emits frames."""
    chunks = [_sine(4410, period=147) for _ in range(3)]
    out = io.StringIO()
    v = animate(iter(chunks), fps=30.0, realtime=False, out=out,
                max_frames=5)
    assert v.ring.total > 0
    text = out.getvalue()
    assert "\x1b[H" in text and "trig=" in text
    assert len(v.last_frame) == v.rows
