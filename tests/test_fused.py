"""Fused block-parallel engine: must match the compat (bit-exact) engine
within the -60 dB target on representative scripts, including voice
packing and the pallas kernels (interpret mode)."""

import numpy as np
import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.engine import render_timeline
from skred_tpu.engine.fused import render_fused
from skred_tpu.host.timeline import compile_script
from skred_tpu.parallel.batch import stack_timelines

SCRIPTS = ["0.sk", "2.sk", "4.sk", "24.sk", "20.sk", "33.sk", "909.sk",
           "75.sk", "15.sk"]


@pytest.fixture(scope="session")
def session_bank():
    return WaveBank()


@pytest.mark.parametrize("script", SCRIPTS)
def test_fused_vs_compat(reference_dir, session_bank, script):
    tl = compile_script((reference_dir / script).read_text().splitlines(),
                        1.0, bank=session_bank.fork(), script_dir=reference_dir)
    st = stack_timelines([tl])
    out = render_fused(st, use_pallas=False)[0]
    ref = render_timeline(tl)
    m = min(len(out), len(ref))
    err = float(np.abs(out[:m] - ref[:m]).max())
    db = 20 * np.log10(err + 1e-30)
    assert db <= -60.0, f"{script}: fused differs {db:.1f} dB"


def test_fused_batch_dedup(reference_dir, session_bank):
    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.5,
                          bank=session_bank.fork(), script_dir=reference_dir)
           for n in ("909.sk", "10.sk", "909.sk")]
    st = stack_timelines(tls)
    # replicated timelines share tables by identity: stacking the same
    # timeline twice packs the exact same buffer as stacking it once
    assert np.array_equal(
        stack_timelines([tls[0], tls[1], tls[0]]).table_buffer,
        stack_timelines(tls[:2]).table_buffer)
    out = render_fused(st, use_pallas=False)
    for i, tl in enumerate(tls):
        r = render_timeline(tl)
        err = float(np.abs(out[i][: len(r)] - r).max())
        assert 20 * np.log10(err + 1e-30) <= -60.0


# scripts chosen to hit the feature-specialized kernel variants:
# 0.sk fm-only; 14.sk nothing (const-inc phase walk, no-state amp kernel);
# 21.sk filter; 30.sk envelope; 35.sk hold+quant+one-shot+loop;
# 46.sk pan-mod+filter+hold+quant+direction+finish
@pytest.mark.parametrize("script",
                         ["0.sk", "14.sk", "21.sk", "30.sk", "35.sk",
                          "46.sk"])
def test_pallas_kernels_interpret(reference_dir, session_bank, script):
    from skred_tpu.engine import kernels

    tl = compile_script((reference_dir / script).read_text().splitlines(),
                        0.05, bank=session_bank.fork(),
                        script_dir=reference_dir, block=128)
    st = stack_timelines([tl] * 3)
    a = render_fused(st, use_pallas=False)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
    assert np.array_equal(a, b), "pallas kernels must match the scan path"


def test_table_lookup_kernel_interpret():
    import jax.numpy as jnp

    from skred_tpu.engine import kernels

    rng = np.random.RandomState(7)
    n_slots = 5
    buf = rng.randn(n_slots * 4096).astype(np.float32)
    slot = rng.randint(0, n_slots, 24).astype(np.int32)
    idx = rng.randint(0, 4096, (24, 512)).astype(np.int32)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    try:
        out = np.asarray(kernels.table_lookup_pallas(
            jnp.asarray(buf).reshape(-1, 32, 128), jnp.asarray(slot),
            jnp.asarray(idx)))
    finally:
        kernels.INTERPRET = old
    want = buf[slot[:, None] * 4096 + idx]
    assert np.array_equal(out, want)
    # big-table index (>= 4096) must yield 0, not garbage
    kernels.INTERPRET = True
    try:
        out2 = np.asarray(kernels.table_lookup_pallas(
            jnp.asarray(buf).reshape(-1, 32, 128),
            jnp.asarray(slot[:1]),
            jnp.asarray(np.full((1, 512), 5000, np.int32))))
    finally:
        kernels.INTERPRET = old
    assert np.all(out2 == 0.0)


def test_table_lookup_grouped_interpret():
    """Grouped LUT kernel (manual DMA + persistent slot-skip register)
    must match the per-lane kernel and the direct numpy lookup, including
    ragged lane counts (internal LUT_GROUP padding) and runs of equal
    slots (the DMA-skip path)."""
    import jax.numpy as jnp

    from skred_tpu.engine import kernels

    rng = np.random.RandomState(11)
    n_slots = 6
    buf = rng.randn(n_slots * 4096).astype(np.float32)
    for m in (24, 37, 64):              # non-multiples of LUT_GROUP too
        slot = rng.randint(0, n_slots, m).astype(np.int32)
        slot[m // 3: 2 * m // 3] = 3    # a run of equal slots (skip path)
        idx = rng.randint(0, 4096, (m, 512)).astype(np.int32)
        old = kernels.INTERPRET
        kernels.INTERPRET = True
        try:
            out = np.asarray(kernels.table_lookup_grouped(
                jnp.asarray(buf).reshape(-1, 32, 128), jnp.asarray(slot),
                jnp.asarray(idx)))
        finally:
            kernels.INTERPRET = old
        want = buf[slot[:, None] * 4096 + idx]
        assert np.array_equal(out, want), m


def test_pallas_lut_single_tier_deep_read(reference_dir, session_bank):
    """Single-tier (no-modulation) scripts binding medium/big PCM tables
    must route through the per-tier rosters; a broken roster key silently
    reads the SMALL-tier LUT, which is only correct for the first 4096
    samples of the table — so the render must run long enough for the
    one-shot playback to pass index 4096 (regression: the 12.sk/34.sk
    on-chip failures at 10 s)."""
    from skred_tpu.engine import kernels

    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.45,
                          bank=session_bank.fork(), script_dir=reference_dir)
           for n in ("12.sk", "35.sk")]
    st = stack_timelines(tls)
    from skred_tpu.parallel.batch import pack_stacked

    stp = pack_stacked(st)
    assert stp.tiers is not None and len(stp.tiers) == 1
    a = render_fused(st, use_pallas=False)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
    err = float(np.abs(a - b).max())
    assert err <= 1e-5, f"single-tier roster lookup diverged: {err}"


def test_pallas_lut_with_big_tables(reference_dir, session_bank):
    """909.sk binds >4096-sample PCM tables → exercises the big-voice
    XLA-gather roster + small-voice VMEM LUT split."""
    from skred_tpu.engine import kernels

    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.3,
                          bank=session_bank.fork(), script_dir=reference_dir)
           for n in ("909.sk", "24.sk")]
    st = stack_timelines(tls)
    a = render_fused(st, use_pallas=False)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
    # table reads are value-exact either way; the remaining ulps come from
    # the phase/filter kernels' op scheduling (same with the LUT disabled)
    err = float(np.abs(a - b).max())
    assert err <= 1e-5, f"LUT+roster diverged from flat gather: {err}"


def test_tier_packing_layout(reference_dir, session_bank):
    """Tier layout invariants: lanes sorted by modulation-DAG depth, every
    tier reads only earlier tiers, fillers are inert."""
    from skred_tpu.parallel.batch import pack_stacked

    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.2,
                          bank=session_bank.fork(), script_dir=reference_dir)
           for n in ("909.sk", "18.sk", "0.sk")]
    st = pack_stacked(stack_timelines(tls))
    assert st.tiers is not None and len(st.tiers) >= 2
    vp = st.params["amp"].shape[-1]
    assert sum(st.tiers) == vp
    bounds = np.cumsum((0,) + st.tiers)
    # every value-carrying SAMPLE-feeding mod read of a tier-k voice
    # targets a voice in an earlier tier (pan-mod edges are exempt: pan
    # is applied globally after all tiers, so the layout ignores them)
    for b in range(st.batch):
        for k in range(len(st.tiers)):
            s, e = bounds[k], bounds[k + 1]
            for name, dep in (("freq_mod_osc", "freq_mod_depth"),
                              ("amp_mod_osc", "amp_mod_depth"),
                              ("cz_mod_osc", "cz_mod_depth")):
                osc = st.params[name][b][:, s:e]
                depth = st.params[dep][b][:, s:e]
                live = (osc >= 0) & (depth != 0) & (osc != np.arange(s, e))
                assert (osc[live] < s).all(), (b, k, name)


def test_tiered_matches_mixed_stack(reference_dir, session_bank):
    """Mixed tier shapes stacked together (padding/filler lanes) must
    still match per-script compat renders."""
    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.4,
                          bank=session_bank.fork(), script_dir=reference_dir)
           for n in ("18.sk", "7.sk", "2.sk", "14.sk")]
    out = render_fused(stack_timelines(tls), use_pallas=False)
    for i, tl in enumerate(tls):
        r = render_timeline(tl)
        err = float(np.abs(out[i][: len(r)] - r).max())
        assert 20 * np.log10(err + 1e-30) <= -60.0, i
