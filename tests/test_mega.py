"""Fused tier megakernel (kernels.tier_pallas) tests.

The megakernel runs the whole per-voice DSP chain (reference hot loop
synth.c:502-630) in one pallas_call per tier; these tests pin its
numerics against the 3-kernel + XLA-glue path (itself corpus-validated
against the reference C engine goldens).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.engine import kernels
from skred_tpu.engine.fused import render_fused
from skred_tpu.host.timeline import compile_script
from skred_tpu.parallel.batch import pack_stacked, stack_timelines

REF = pathlib.Path("/root/reference")


def test_kdiv_correctly_rounded_from_perturbed_seed():
    """_kdiv must produce the correctly-rounded f32 quotient (the f64
    round-trip, i.e. render._div32) even when the reciprocal seed is off
    by ±1 ulp — the TPU's native rcp error model."""
    rng = np.random.default_rng(7)
    # cz-realistic operand ranges plus random normal bit patterns
    a = np.concatenate([
        rng.uniform(0, 1.2e6, 200_000),
        np.float32(0.5) * np.ones(100_000),
        rng.uniform(0, 1.0, 200_000),
    ]).astype(np.float32)
    b = np.concatenate([
        rng.uniform(1.0, 1.2e6, 200_000),
        rng.uniform(1e-3, 1.0, 100_000),
        rng.uniform(1e-3, 2.0, 200_000),
    ]).astype(np.float32)
    want = (a.astype(np.float64) / b.astype(np.float64)).astype(np.float32)
    y0 = (1.0 / b).astype(np.float32)
    for shift in (0, 1, -1):   # exact, +1 ulp, -1 ulp seeds
        y = y0 if shift == 0 else np.frombuffer(
            (y0.view(np.int32) + np.int32(shift)).tobytes(), np.float32)
        got = np.asarray(jax.jit(kernels._kdiv_from)(
            jnp.asarray(y), jnp.asarray(a), jnp.asarray(b)))
        bad = got != want
        assert not bad.any(), (
            f"seed shift {shift}: {bad.sum()} wrong quotients, first "
            f"{a[bad][:3]} / {b[bad][:3]} -> {got[bad][:3]} != {want[bad][:3]}")


def test_kdiv_inv_matches_kdiv():
    """_kdiv_inv (Markstein: hoisted correctly-rounded reciprocal + one
    residual correction) must equal the full _kdiv bit-for-bit — it is
    what the megakernel's CZ phase normalization uses per sample, with
    the reciprocal computed once per grid step."""
    rng = np.random.default_rng(11)
    # cz-realistic: a = phase in [0, tsize), b = table sizes incl. the
    # awkward non-pow2 PCM lengths, plus broad random ranges
    sizes = np.array([707, 2048, 2766, 4096, 8186, 27618, 28440, 28932,
                      30826, 47518, 52320], np.float32)
    b = np.concatenate([
        np.repeat(sizes, 40_000),
        rng.uniform(1e-3, 1.2e6, 200_000).astype(np.float32),
    ]).astype(np.float32)
    a = (rng.uniform(0, 1, b.size).astype(np.float32) * b).astype(
        np.float32)
    want = np.asarray(jax.jit(kernels._kdiv)(jnp.asarray(a),
                                             jnp.asarray(b)))
    y1 = np.asarray(jax.jit(kernels._kdiv)(jnp.float32(1.0),
                                           jnp.asarray(b)))
    got = np.asarray(jax.jit(kernels._kdiv_inv)(
        jnp.asarray(a), jnp.asarray(y1), jnp.asarray(b)))
    bad = got != want
    assert not bad.any(), (
        f"{bad.sum()} mismatches, first {a[bad][:3]} / {b[bad][:3]} -> "
        f"{got[bad][:3]} != {want[bad][:3]}")


@pytest.mark.parametrize("modes", [
    kernels.CZ_ALL, (1,), (1, 4), (2, 3, 5), (6,), (7,), (6, 7),
    (1, 2, 3, 4, 5), (4, 6, 7)])
@pytest.mark.parametrize("exact", [True, False])
def test_cz_warp_fast_matches_warp_k(modes, exact):
    """The collapsed hoisted-coefficient warp (_cz_warp_coeffs +
    _cz_warp_fast) must be bit-equal to the per-mode _cz_warp_k for
    every mode subset, including the knee/endpoint phases (0, d, 0.5,
    1.0) where the mode-2 rewrite fma(-(1-phase),s,1) == fma(phase-1,
    s,1) relies on round-to-nearest negation symmetry."""
    rng = np.random.default_rng(13)
    n = 200_000
    mode = rng.integers(0, 8, n).astype(np.int32)  # incl. absent + 0
    d = rng.uniform(0.0, 1.1, n).astype(np.float32)  # pre-clip range
    tsize = rng.choice(np.array([707, 2048, 4096, 28932, 52320],
                                np.float32), n)
    frac = np.concatenate([
        rng.uniform(0, 1, n - 4 * (n // 8)).astype(np.float32),
        np.full(n // 8, 0.0, np.float32),
        np.full(n // 8, 0.5, np.float32),
        np.full(n // 8, 1.0 - 2 ** -24, np.float32),
        d[:n // 8],                      # sit exactly on mode 1's knee
    ])[:n]
    ph = (frac * tsize).astype(np.float32)

    def both(mode, ph, d, tsize):
        scales = kernels._cz_scales(d, exact, modes)
        phase = kernels._kdiv(ph, tsize) if exact else ph / tsize
        old = kernels._cz_warp_k(mode, ph, None, tsize, exact, scales,
                                 phase, modes)
        coeffs = kernels._cz_warp_coeffs(mode, scales, modes)
        new = kernels._cz_warp_fast(coeffs, mode, phase, tsize, exact,
                                    modes)
        return old, new

    old, new = jax.jit(both)(jnp.asarray(mode), jnp.asarray(ph),
                             jnp.asarray(d), jnp.asarray(tsize))
    old, new = np.asarray(old), np.asarray(new)
    bad = old.view(np.int32) != new.view(np.int32)
    assert not bad.any(), (
        f"modes={modes} exact={exact}: {bad.sum()} bit mismatches, "
        f"first mode {mode[bad][:3]} ph {ph[bad][:3]} d {d[bad][:3]} "
        f"-> {new[bad][:3]} != {old[bad][:3]}")


def _mega_vs_xla(lines_list, seconds=0.15, reps=2):
    bank = WaveBank()
    tls = []
    for lines in lines_list * reps:
        tls.append(compile_script(lines, seconds, bank=bank,
                                  script_dir=REF))
        assert tls[-1].fused_passes is not None
    st = pack_stacked(stack_timelines(tls))
    a = render_fused(st, use_pallas=False)
    calls = [0]
    orig = kernels.tier_pallas

    def counted(*args, **kw):
        calls[0] += 1
        return orig(*args, **kw)

    old = kernels.INTERPRET
    kernels.INTERPRET = True
    kernels.tier_pallas = counted
    # the counted wrapper only fires on a fresh trace: an identically
    # shaped/static program compiled by an earlier test would come back
    # from the jit cache without calling it
    jax.clear_caches()
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
        kernels.tier_pallas = orig
    assert calls[0] > 0, "megakernel was gated off for every tier"
    return float(np.abs(a - b).max())


def test_mega_mixed_tables_nonuniform_slots():
    """Rows binding different wavetables (procedural w0 vs Korg w35 vs
    w42) land different table slots on adjacent lanes — exercises the
    megakernel's per-slot-run DMA fallback, not just the uniform fast
    path."""
    d = _mega_vs_xla([
        ["v0 w0 f440 a4 p0.2"],
        ["v0 w35 f330 a4 p-0.2"],
        ["v0 w42 f220 a3"],
    ])
    assert d == 0.0, f"mega vs xla maxdiff {d}"


def test_mega_pcm_oneshot_medium_slot():
    """One-shot PCM voices (w100+, 32768-sample medium slots) with
    note-on velocity: finish bookkeeping + medium-table lookup."""
    d = _mega_vs_xla([
        ["v0 w100 n60 a4 l1 T"],
        ["v0 w103 n55 a4 l0.8 T"],
    ], seconds=0.2)
    assert d == 0.0, f"mega vs xla maxdiff {d}"


def test_mega_big_table_wavetable_loop():
    """A looping voice over a >32768-sample PCM table wraps the whole
    table every few blocks — the per-step index range spans several
    32768-sample windows, exercising the megakernel's multi-window DMA
    loop (not just the streaming play-head case)."""
    d = _mega_vs_xla([
        ["v0 w100 f440 a4 l1 T"],            # large AMY PCM, looped
        ["v0 w100 f93.7 a4 l1 T"],
    ], seconds=0.2)
    assert d == 0.0, f"mega vs xla maxdiff {d}"


def test_mega_sublane_width_invariance():
    """Widening the megakernel's grid step from one (8,128) vreg to 2-4
    (the ILP lever for the latency-bound serial loops) must not change a
    single bit: same lanes, different partition.  Direct tier_pallas
    call at 4096 lanes so sub=32 actually engages."""
    rng = np.random.default_rng(0)
    n, m = 64, 4096
    feat = (False, False, False, False, True, True, False, False,
            False, False, False, False, (), False)  # flt + smoother
    vecs = dict(
        base_off=np.zeros(m, np.int32),
        clip_i=np.full(m, 4095, np.int32),
        adv=np.ones(m, np.int32), act=np.ones(m, np.int32),
        lo=np.zeros(m, np.float32), hi=np.full(m, 4096.0, np.float32),
        L=np.full(m, 4096.0, np.float32),
        amp=rng.uniform(0.5, 1, m).astype(np.float32),
        b0=np.full(m, 0.2, np.float32), b1=np.full(m, 0.3, np.float32),
        b2=np.full(m, 0.1, np.float32), na1=np.full(m, -0.4, np.float32),
        na2=np.full(m, 0.05, np.float32), use_flt=np.ones(m, np.int32),
        use_sm=np.ones(m, np.int32),
        smoothing=np.full(m, 0.02, np.float32),
    )
    states = dict(
        phase=rng.uniform(0, 4096, m).astype(np.float32),
        finished=np.zeros(m, np.int32),
        x1=np.zeros(m, np.float32), x2=np.zeros(m, np.float32),
        y1=np.zeros(m, np.float32), y2=np.zeros(m, np.float32),
        smoother=np.zeros(m, np.float32),
    )
    tab = rng.standard_normal((32768, 128)).astype(np.float32)
    slot = np.zeros(m, np.int32)
    cbase = np.zeros(1, np.int32)
    inc = rng.uniform(1, 50, m).astype(np.float32)
    old_cap, old_int = kernels.MEGA_SUB_MAX, kernels.INTERPRET
    kernels.INTERPRET = True
    outs = {}
    try:
        for cap in (8, 32):
            kernels.MEGA_SUB_MAX = cap
            jax.clear_caches()   # width is read at trace time
            out, res = kernels.tier_pallas(
                jnp.asarray(tab), jnp.asarray(slot), jnp.asarray(cbase),
                jnp.asarray(inc), None, None,
                {k: jnp.asarray(v) for k, v in vecs.items()},
                {k: jnp.asarray(v) for k, v in states.items()},
                feat=feat, exact=True, n=n)
            outs[cap] = (np.asarray(out),
                         {k: np.asarray(v) for k, v in res.items()})
    finally:
        kernels.MEGA_SUB_MAX, kernels.INTERPRET = old_cap, old_int
        jax.clear_caches()
    assert np.array_equal(outs[8][0], outs[32][0])
    for k in outs[8][1]:
        assert np.array_equal(outs[8][1][k], outs[32][1][k]), k


def test_mega_sublane_width_invariance_fast():
    """Fast mode (exact=False) widens grid steps to 64 sublane rows
    (MEGA_SUB_MAX_FAST) — same bit-invariance requirement across
    partitions.  8192 lanes so sub=64 actually engages."""
    rng = np.random.default_rng(1)
    n, m = 64, 8192
    feat = (False, False, False, False, True, True, False, False,
            False, False, False, False, (), False)  # flt + smoother
    full = lambda v, dt=np.float32: np.full(m, v, dt)
    vecs = dict(
        base_off=np.zeros(m, np.int32), clip_i=full(4095, np.int32),
        adv=np.ones(m, np.int32), act=np.ones(m, np.int32),
        lo=full(0.0), hi=full(4096.0), L=full(4096.0),
        amp=rng.uniform(0.5, 1, m).astype(np.float32),
        b0=full(0.2), b1=full(0.3), b2=full(0.1), na1=full(-0.4),
        na2=full(0.05), use_flt=np.ones(m, np.int32),
        use_sm=np.ones(m, np.int32), smoothing=full(0.02),
    )
    states = dict(
        phase=rng.uniform(0, 4096, m).astype(np.float32),
        finished=np.zeros(m, np.int32),
        x1=np.zeros(m, np.float32), x2=np.zeros(m, np.float32),
        y1=np.zeros(m, np.float32), y2=np.zeros(m, np.float32),
        smoother=np.zeros(m, np.float32),
    )
    tab = rng.standard_normal((32768, 128)).astype(np.float32)
    slot = np.zeros(m, np.int32)
    cbase = np.zeros(1, np.int32)
    inc = rng.uniform(1, 50, m).astype(np.float32)
    old_cap, old_int = kernels.MEGA_SUB_MAX_FAST, kernels.INTERPRET
    kernels.INTERPRET = True
    outs = {}
    try:
        for cap in (8, 64):
            kernels.MEGA_SUB_MAX_FAST = cap
            jax.clear_caches()   # width is read at trace time
            out, res = kernels.tier_pallas(
                jnp.asarray(tab), jnp.asarray(slot), jnp.asarray(cbase),
                jnp.asarray(inc), None, None,
                {k: jnp.asarray(v) for k, v in vecs.items()},
                {k: jnp.asarray(v) for k, v in states.items()},
                feat=feat, exact=False, n=n)
            outs[cap] = (np.asarray(out),
                         {k: np.asarray(v) for k, v in res.items()})
    finally:
        kernels.MEGA_SUB_MAX_FAST, kernels.INTERPRET = old_cap, old_int
        jax.clear_caches()
    assert np.array_equal(outs[8][0], outs[64][0])
    for k in outs[8][1]:
        assert np.array_equal(outs[8][1][k], outs[64][1][k]), k


def test_mega_lane_padding_invariance():
    """Lane counts not divisible by the step width are padded with inert
    lanes so wider steps still engage (kernels._mega_sub_pad): 5120
    lanes = 40 sublane rows pads to 48 at w=16.  Padding must not change
    any real lane's output or end state."""
    rng = np.random.default_rng(2)
    n, m = 64, 5120                      # 40 rows: % 16 != 0 -> pads
    feat = (False, False, False, False, True, True, False, False,
            False, False, False, False, (), False)
    full = lambda v, dt=np.float32: np.full(m, v, dt)
    vecs = dict(
        base_off=np.zeros(m, np.int32), clip_i=full(4095, np.int32),
        adv=np.ones(m, np.int32), act=np.ones(m, np.int32),
        lo=full(0.0), hi=full(4096.0), L=full(4096.0),
        amp=rng.uniform(0.5, 1, m).astype(np.float32),
        b0=full(0.2), b1=full(0.3), b2=full(0.1), na1=full(-0.4),
        na2=full(0.05), use_flt=np.ones(m, np.int32),
        use_sm=np.ones(m, np.int32), smoothing=full(0.02),
    )
    states = dict(
        phase=rng.uniform(0, 4096, m).astype(np.float32),
        finished=np.zeros(m, np.int32),
        x1=np.zeros(m, np.float32), x2=np.zeros(m, np.float32),
        y1=np.zeros(m, np.float32), y2=np.zeros(m, np.float32),
        smoother=np.zeros(m, np.float32),
    )
    tab = rng.standard_normal((32768, 128)).astype(np.float32)
    slot = np.zeros(m, np.int32)
    cbase = np.zeros(1, np.int32)
    inc = rng.uniform(1, 50, m).astype(np.float32)
    old_cap, old_int = kernels.MEGA_SUB_MAX, kernels.INTERPRET
    kernels.INTERPRET = True
    outs = {}
    try:
        for cap in (8, 16):              # 8: no pad; 16: padded 40->48
            kernels.MEGA_SUB_MAX = cap
            jax.clear_caches()
            out, res = kernels.tier_pallas(
                jnp.asarray(tab), jnp.asarray(slot), jnp.asarray(cbase),
                jnp.asarray(inc), None, None,
                {k: jnp.asarray(v) for k, v in vecs.items()},
                {k: jnp.asarray(v) for k, v in states.items()},
                feat=feat, exact=True, n=n)
            assert out.shape == (n, m), out.shape
            outs[cap] = (np.asarray(out),
                         {k: np.asarray(v) for k, v in res.items()})
    finally:
        kernels.MEGA_SUB_MAX, kernels.INTERPRET = old_cap, old_int
        jax.clear_caches()
    assert np.array_equal(outs[8][0], outs[16][0])
    for k in outs[8][1]:
        assert np.array_equal(outs[8][1][k], outs[16][1][k]), k


@pytest.mark.parametrize("script", ["2.sk", "33.sk", "909.sk", "75.sk",
                                    "65.sk", "48.sk", "10.sk"])
def test_mega_corpus_scripts(script):
    """Corpus scripts spanning fm/cz/am/pan mod, S&H, filters, envelopes,
    sequencer PCM, sample loading: megakernel output must be bit-equal
    to the 3-kernel + glue path."""
    lines = (REF / script).read_text().splitlines()
    d = _mega_vs_xla([lines], seconds=0.25, reps=1)
    assert d == 0.0, f"{script}: mega vs xla maxdiff {d}"


def _mix_vecs_states(rng, m, flt=True):
    full = lambda v, dt=np.float32: np.full(m, v, dt)
    vecs = dict(
        base_off=np.zeros(m, np.int32), clip_i=full(4095, np.int32),
        adv=np.ones(m, np.int32), act=np.ones(m, np.int32),
        lo=full(0.0), hi=full(4096.0), L=full(4096.0),
        amp=rng.uniform(0.5, 1, m).astype(np.float32),
    )
    states = dict(phase=rng.uniform(0, 4096, m).astype(np.float32),
                  finished=np.zeros(m, np.int32))
    if flt:
        vecs.update(b0=full(0.2), b1=full(0.3), b2=full(0.1),
                    na1=full(-0.4), na2=full(0.05),
                    use_flt=np.ones(m, np.int32),
                    use_sm=np.ones(m, np.int32), smoothing=full(0.02))
        states.update(x1=np.zeros(m, np.float32), x2=np.zeros(m, np.float32),
                      y1=np.zeros(m, np.float32), y2=np.zeros(m, np.float32),
                      smoother=np.zeros(m, np.float32))
    return vecs, states


@pytest.mark.parametrize("B,V,cap", [(1024, 3, 32),   # fold_k path
                                     (2048, 2, 8)])   # dynamic-offset path
def test_mega_inkernel_mix_matches_xla_sum(B, V, cap):
    """The in-kernel static-pan mix (tier kernel phase 5) must reproduce
    the XLA cross-voice weighted sum on both accumulator layouts (step
    spans several voices / voice spans several steps), leave the sample
    stream and end states bit-identical, and emit out_last == out[-1]
    (reference mix loop: synth.c:630-641)."""
    rng = np.random.default_rng(0)
    n, m = 64, B * V
    feat = (False, False, False, False, True, True, False, False,
            False, False, False, False, (), False)
    vecs, states = _mix_vecs_states(rng, m)
    tab = rng.standard_normal((32768, 128)).astype(np.float32)
    slot = np.zeros(m, np.int32)
    cbase = np.zeros(1, np.int32)
    inc = rng.uniform(1, 50, m).astype(np.float32)
    wl = rng.uniform(0, 1, m).astype(np.float32)
    wr = rng.uniform(0, 1, m).astype(np.float32)
    ja = {k: jnp.asarray(v) for k, v in vecs.items()}
    js = {k: jnp.asarray(v) for k, v in states.items()}
    old_cap, old_int = kernels.MEGA_SUB_MAX, kernels.INTERPRET
    kernels.INTERPRET = True
    kernels.MEGA_SUB_MAX = cap
    jax.clear_caches()
    try:
        args = (jnp.asarray(tab), jnp.asarray(slot), jnp.asarray(cbase),
                jnp.asarray(inc), None, None, ja, js)
        out0, res0 = kernels.tier_pallas(*args, feat=feat, exact=True, n=n)
        out1, res1 = kernels.tier_pallas(
            *args, feat=feat, exact=True, n=n,
            mixw=(jnp.asarray(wl), jnp.asarray(wr)), b_rows=B // 128)
    finally:
        kernels.MEGA_SUB_MAX, kernels.INTERPRET = old_cap, old_int
        jax.clear_caches()
    assert "acc_l" in res1, "in-kernel mix did not engage"
    assert np.array_equal(np.asarray(out0), np.asarray(out1))
    o = np.asarray(out0).reshape(n, V, B)
    for key, w in (("acc_l", wl), ("acc_r", wr)):
        want = (o * w.reshape(V, B)[None]).sum(axis=1)
        got = np.asarray(res1[key])
        assert np.abs(got - want).max() < 1e-4, key
    assert np.array_equal(np.asarray(res1["out_last"]), np.asarray(out0)[-1])
    for k in res0:
        assert np.array_equal(np.asarray(res0[k]), np.asarray(res1[k])), k


def test_mega_inkernel_mix_end_to_end(monkeypatch):
    """Full fused render with the in-kernel mix engaged (pan + pan-mod +
    disconnect lanes) vs the pure-XLA path.  b_rows >= 8 needs 1024+ rows
    on real hardware; interpret mode has no tile constraint, so the
    eligibility floor is lowered to exercise the whole glue (weights,
    pan-mod slab, accumulator transpose, out_last carry) at 128 rows.
    ULP-level reassociation of the cross-voice sum is the documented
    contract (_mix_parts docstring)."""
    bank = WaveBank()
    lines = ["v0 w2 f2 a2", "v1 w0 f330 a3 p-0.4",
             "v2 w0 f220 a3 p0.3 P0 Q0.9", "v3 w5 f110 a2 x1"]
    tls = [compile_script(lines, 0.08, bank=bank, script_dir=REF)
           for _ in range(128)]
    st = pack_stacked(stack_timelines(tls))
    a = render_fused(st, use_pallas=False)
    real = kernels.mix_rows

    def lax_rows(m, n, n_seq, exact, b_rows, extra=0):
        sub, _ = kernels._mega_sub_pad(m, n, n_seq, exact, extra)
        ok = (b_rows >= 1 and n % 8 == 0
              and (sub % b_rows == 0 or b_rows % sub == 0))
        return b_rows if ok else 0

    monkeypatch.setattr(kernels, "mix_rows", lax_rows)
    monkeypatch.setattr(kernels, "INTERPRET", True)
    jax.clear_caches()
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        monkeypatch.setattr(kernels, "mix_rows", real)
        monkeypatch.setattr(kernels, "INTERPRET", False)
        jax.clear_caches()
    d = float(np.abs(a - b).max())
    assert d < 1e-5, f"in-kernel mix end-to-end maxdiff {d}"


def test_mega_fold_segment_varying_edges():
    """Modulator-bank fold with MID-RENDER graph rewiring: the fm edge
    retargets (v0 reads v1, then v2) and depths change at a segment
    boundary.  The bank-row maps are scalar-prefetched per block from
    the gathered segment params, so the fold must track the rewire
    exactly; eligibility only requires row-uniformity across the BATCH
    (fused._fold_tiers), not across segments.  1024 replicated rows on
    the interpreter vs the pure-XLA path."""
    from skred_tpu.engine.fused import (_feat_tiers, _fold_tiers,
                                        render_fused)
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    bank = WaveBank()
    lines = [
        "v1 w2 f2 a2",                     # LFO A (tier 0)
        "v2 w4 f3 a2",                     # LFO B (tier 0)
        "v0 w0 f330 a3 F1,0.5 "            # v0 fm-reads v1 ...
        "~.06 v0 F2,0.8 "                  # ... then rewires to v2
        "~.06 v0 F1,0.2",                  # ... and back, new depth
    ]
    tls = [compile_script(lines, 0.2, bank=bank, script_dir=REF)
           for _ in range(1024)]
    st = pack_stacked(stack_timelines(tls))
    assert st.params["amp"].shape[1] >= 3, "expected >= 3 segments"
    ftl = _fold_tiers(st, _feat_tiers(st), True)
    assert ftl is not None and ftl[-1], f"fold did not engage: {ftl}"
    a = render_fused(st, use_pallas=False)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
        jax.clear_caches()
    d = float(np.abs(a - b).max())
    assert d < 1e-5, f"fold segment-rewire maxdiff {d}"


def test_mega_fold_end_to_end():
    """Modulator-bank fold across all three stream kinds at once: a
    delayed fm edge (reader index < modulator index), an am edge and a
    cz-mod edge all reading the same tier-0 LFO.  1024 replicated rows
    (the fold's minimum batch) on the interpreter vs the pure-XLA path;
    the only allowed difference is the in-kernel mix's reassociated
    cross-voice sum (ULP-level)."""
    from skred_tpu.engine.fused import (_feat_tiers, _fold_tiers,
                                        render_fused)
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    bank = WaveBank()
    lines = [
        "v0 w0 f330 a3 F1,0.5",          # fm read of v1 (delayed)
        "v1 w2 f2 a2",                   # LFO modulator (tier 0)
        "v2 w0 f220 a3 A1,0.4",          # am read of v1
        "v3 w4 f110 a3 c1,0.5 C1,0.3",   # cz-mod read of v1
    ]
    tls = [compile_script(lines, 0.05, bank=bank, script_dir=REF)
           for _ in range(1024)]
    st = pack_stacked(stack_timelines(tls))
    ftl = _fold_tiers(st, _feat_tiers(st), True)
    assert ftl is not None and ftl[-1], f"fold did not engage: {ftl}"
    a = render_fused(st, use_pallas=False)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
        jax.clear_caches()
    d = float(np.abs(a - b).max())
    assert d < 1e-5, f"fold end-to-end maxdiff {d}"
