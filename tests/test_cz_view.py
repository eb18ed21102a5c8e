"""CZ curve viewer: the plotted curve IS the engine's warp.

Reference analog: /root/reference/cz_show (Tk prototype plotter); here
the curves come straight from engine.fused._cz_phasor (synth.c:149-215),
so viewer parity is engine parity.
"""

import numpy as np

from skred_tpu.frontends.cz_view import (MODE_NAMES, curve_frame,
                                         warp_curve, wave_frame)


def test_warp_curve_matches_engine():
    import jax.numpy as jnp
    from skred_tpu.engine.fused import _cz_phasor
    ph = (np.arange(256, dtype=np.float32) / 256) * 1024
    for mode in MODE_NAMES:
        want = np.asarray(_cz_phasor(jnp.int32(mode), jnp.asarray(ph),
                                     jnp.float32(0.33), jnp.float32(1024)),
                          np.float32) / 1024.0
        got = warp_curve(mode, 0.33, 1024, points=256)
        assert np.array_equal(got, want), mode


def test_warp_zero_dist_mode1_is_identity_diagonal():
    # mode 1 at d->0.5 keeps the breakpoint at half: straight line
    cur = warp_curve(1, 0.5, 1024, points=128)
    assert np.allclose(cur, np.arange(128) / 128, atol=1e-3)


def test_curve_frame_shape_and_marks():
    cur = warp_curve(2, 0.9, 1024)
    lines = curve_frame([cur], ["d=0.9"], rows=11, cols=40)
    assert len(lines) == 12           # rows + legend
    assert all(len(l) == 40 for l in lines[:-1])
    assert any("|" in l for l in lines[:-1])      # curve drawn
    assert "d=0.9" in lines[-1]


def test_curve_frame_overlap_marker():
    cur = warp_curve(1, 0.5, 1024)    # identity — lands on the diagonal
    lines = curve_frame([cur, cur], ["a", "b"], rows=9, cols=32)
    joined = "".join(lines[:-1])
    assert "@" in joined              # second curve overlaps the first


def test_wave_frame_square_warp_renders():
    table = np.sin(2 * np.pi * np.arange(1024) / 1024).astype(np.float32)
    lines = wave_frame(2, 0.9, table, rows=9, cols=32)
    assert len(lines) == 9
    assert any("|" in l for l in lines)


def test_cli_smoke(capsys):
    from skred_tpu.frontends.cz_view import show
    show(modes=[4], dists=[0.5], cols=32, rows=9)
    out = capsys.readouterr().out
    assert "cz mode 4" in out
