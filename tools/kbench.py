#!/usr/bin/env python3
"""Per-kernel TPU microbenchmark at heavy-bucket shapes.

Times each Pallas kernel of the fused engine in isolation (scanned over
a chunk's worth of blocks, state threaded to serialize) at the lane
shapes of the slowest bench buckets, against prototype variants:

  * phase / fs kernels with 3-D ``[N, 8, 128]`` blocks — one full
    (8,128) vreg per serial step instead of a (1, LANES) row at 1/8
    sublane utilization;
  * a uniform-slot LUT kernel (one table DMA per 64-lane group, lanes
    are voice-major so replica runs share slots) with the masked-row
    loop bounded to the phase window actually touched in the block.

Usage: python tools/kbench.py [M] [--check]   (--check: CPU interpret
correctness vs the production kernels, no TPU timing)
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

CHECK = "--check" in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
M = int(args[0]) if args else 5120
N = 512
REPS = 172

import jax

if CHECK:
    jax.config.update("jax_platforms", "cpu")
cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skred_tpu.engine import kernels as K

if CHECK:
    K.INTERPRET = True

F32 = jnp.float32
I32 = jnp.int32


# ---------------------------------------------------------------- 3-D phase
def phase_walk_3d(inc, phase0, fin0, lo, hi, L, osn, one_shot, adv, act):
    """Same kernel body as phase_walk_pallas (fm=True, finish=True) with
    [N, 8, 128] blocks: each fori step is one full vreg."""
    m = inc.shape[-1]
    assert m % 1024 == 0
    grid = (m // 1024,)
    n = inc.shape[0]
    r3 = lambda a: a.reshape(a.shape[0], m // 128, 128) if a.ndim == 2 \
        else a.reshape(1, m // 128, 128)
    seq = pl.BlockSpec((n, 8, 128), lambda i: (i * 0, i, i * 0))
    vec = pl.BlockSpec((1, 8, 128), lambda i: (i * 0, i, i * 0))
    ins = [r3(inc), r3(phase0[None]), r3(fin0[None]), r3(lo[None]),
           r3(hi[None]), r3(L[None]), r3(osn[None]), r3(one_shot[None]),
           r3(adv[None]), r3(act[None])]
    in_specs = [seq, vec, vec, vec, vec, vec, vec, vec, vec, vec]
    out_specs = [seq, seq, vec, vec]
    out_shape = [jax.ShapeDtypeStruct((n, m // 128, 128), jnp.float32),
                 jax.ShapeDtypeStruct((n, m // 128, 128), jnp.int32),
                 jax.ShapeDtypeStruct((1, m // 128, 128), jnp.float32),
                 jax.ShapeDtypeStruct((1, m // 128, 128), jnp.int32)]
    ph, dead, ph_e, fin_e = pl.pallas_call(
        K._PHASE_KERNELS[(True, True)], grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=K.INTERPRET,
    )(*ins)
    return (ph.reshape(n, m), dead.reshape(n, m), ph_e.reshape(m),
            fin_e.reshape(m))


# ------------------------------------------------------------------ 3-D fs
FSFEAT = (True, True, False, False, False, True, False, True)


def fs_3d(x, env, alive, b0, b1, b2, na1, na2, use_flt, use_sm, amp,
          smoothing, x1, x2, y1, y2, sg, exact=True):
    """filt_smooth kernel (flt+sm+env+alive feat) with [N, 8, 128] blocks."""
    n, m = x.shape
    assert m % 1024 == 0
    grid = (m // 1024,)
    r3 = lambda a: a.reshape(a.shape[0], m // 128, 128) if a.ndim == 2 \
        else a.reshape(1, m // 128, 128)
    seq = pl.BlockSpec((n, 8, 128), lambda i: (i * 0, i, i * 0))
    vec = pl.BlockSpec((1, 8, 128), lambda i: (i * 0, i, i * 0))
    ins = [r3(x), r3(alive), r3(env), r3(amp[None]), r3(b0[None]),
           r3(b1[None]), r3(b2[None]), r3(na1[None]), r3(na2[None]),
           r3(use_flt[None]), r3(use_sm[None]), r3(smoothing[None]),
           r3(x1[None]), r3(x2[None]), r3(y1[None]), r3(y2[None]),
           r3(sg[None])]
    in_specs = [seq, seq, seq] + [vec] * 14
    out_specs = [seq] + [vec] * 5
    out_shape = [jax.ShapeDtypeStruct((n, m // 128, 128), jnp.float32)] + \
        [jax.ShapeDtypeStruct((1, m // 128, 128), jnp.float32)] * 5
    outs = pl.pallas_call(
        K._fs_kernel_for(exact, FSFEAT), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=K.INTERPRET,
    )(*ins)
    return [outs[0].reshape(n, m)] + [o.reshape(m) for o in outs[1:]]


# ------------------------------------------------------- windowed LUT v3
def _make_lut_v3(slot_rows, G, r):
    def kernel(slotg_ref, tab_ref, idx_ref, out_ref, scratch, acc, cur, sem):
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _init():
            cur[0] = jnp.int32(-1)

        s = slotg_ref[p]

        @pl.when(s != cur[0])
        def _fetch():
            cp = pltpu.make_async_copy(tab_ref.at[s], scratch, sem)
            cp.start()
            cp.wait()
            cur[0] = s

        i = idx_ref[0].reshape(G * r, 128)
        hi = jax.lax.shift_right_logical(i, jnp.int32(7))
        lo = jax.lax.bitwise_and(i, jnp.int32(127))
        hmin = jnp.min(hi)
        hmax = jnp.max(hi)
        acc[...] = jnp.zeros((G * r, 128), jnp.float32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        for c in range(slot_rows):
            @pl.when((hmin <= c) & (c <= hmax))
            def _row(c=c):
                bc = jnp.broadcast_to(scratch[c:c + 1, :], (G * r, 128))
                g = jax.lax.gather(
                    bc, lo[..., None], dnums, slice_sizes=(1, 1),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                acc[...] = jnp.where(hi == c, g, acc[...])
        out_ref[0] = acc[...].reshape(G, r, 128)

    return kernel


@functools.lru_cache(maxsize=None)
def _lut_v3_for(slot_rows, G, r):
    return _make_lut_v3(slot_rows, G, r)


def table_lookup_v3(table3, slot, idx, slot_size=4096, G=64):
    """Uniform-slot windowed VMEM lookup: lanes must be voice-major with
    per-voice runs a multiple of G (each group binds ONE table)."""
    m, n = idx.shape
    r = n // 128
    rows = slot_size // 128
    assert m % G == 0
    idx4 = idx.reshape(m // G, G, r, 128)
    slot_g = slot[::G].astype(jnp.int32)
    out = pl.pallas_call(
        _lut_v3_for(rows, G, r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((1, G, r, 128),
                             lambda p, s: (p, p * 0, p * 0, p * 0)),
            ],
            out_specs=pl.BlockSpec((1, G, r, 128),
                                   lambda p, s: (p, p * 0, p * 0, p * 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((G * r, 128), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m // G, G, r, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=K.INTERPRET,
    )(slot_g, table3, idx4)
    return out.reshape(m, n)


# ------------------------------------------------- prefetch-window LUT v4
def _make_lut_v4(slot_rows, G, r):
    """Windowed uniform-slot LUT: per-group slot + [hmin, hmax] row window
    arrive as prefetched scalars (computed by XLA reductions outside the
    kernel — in-kernel vector→scalar reductions of v3 cost ~10 µs/step in
    pipeline stalls).  Rows outside the window are pl.when-skipped; the
    gather runs vectorized over the whole (G·r, 128) block."""
    GR = G * r

    def kernel(slotg_ref, wmin_ref, wmax_ref, tab_ref, idx_ref, out_ref,
               scratch, acc, cur, sem):
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _init():
            cur[0] = jnp.int32(-1)

        s = slotg_ref[p]

        @pl.when(s != cur[0])
        def _fetch():
            cp = pltpu.make_async_copy(tab_ref.at[s], scratch, sem)
            cp.start()
            cp.wait()
            cur[0] = s

        i = idx_ref[0].reshape(GR, 128)
        hi = jax.lax.shift_right_logical(i, jnp.int32(7))
        lo = jax.lax.bitwise_and(i, jnp.int32(127))
        hmin = wmin_ref[p]
        hmax = wmax_ref[p]
        acc[...] = jnp.zeros((GR, 128), jnp.float32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        for c in range(slot_rows):
            @pl.when((hmin <= c) & (c <= hmax))
            def _row(c=c):
                bc = jnp.broadcast_to(scratch[c:c + 1, :], (GR, 128))
                g = jax.lax.gather(
                    bc, lo[..., None], dnums, slice_sizes=(1, 1),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                acc[...] = jnp.where(hi == c, g, acc[...])
        out_ref[0] = acc[...].reshape(G, r, 128)

    return kernel


@functools.lru_cache(maxsize=None)
def _lut_v4_for(slot_rows, G, r):
    return _make_lut_v4(slot_rows, G, r)


def table_lookup_v4(table3, slot, idx, slot_size=4096, G=64):
    m, n = idx.shape
    r = n // 128
    rows = slot_size // 128
    assert m % G == 0
    idx4 = idx.reshape(m // G, G, r, 128)
    slot_g = slot[::G].astype(jnp.int32)
    hi_g = jax.lax.shift_right_logical(
        idx4.reshape(m // G, -1), jnp.int32(7))
    wmin = jnp.min(hi_g, axis=1).astype(jnp.int32)
    wmax = jnp.minimum(jnp.max(hi_g, axis=1),
                       jnp.int32(rows - 1)).astype(jnp.int32)
    out = pl.pallas_call(
        _lut_v4_for(rows, G, r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(m // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((1, G, r, 128),
                             lambda p, s, w1, w2: (p, p * 0, p * 0, p * 0)),
            ],
            out_specs=pl.BlockSpec((1, G, r, 128),
                                   lambda p, s, w1, w2: (p, p * 0, p * 0,
                                                         p * 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((G * r, 128), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m // G, G, r, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=K.INTERPRET,
    )(slot_g, wmin, wmax, table3, idx4)
    return out.reshape(m, n)


# ------------------------------------------------------------------ data
rng = np.random.default_rng(0)


def mkdata():
    inc = jnp.asarray(rng.uniform(0.5, 2.0, (N, M)).astype(np.float32))
    phase0 = jnp.zeros(M, np.float32)
    fin0 = jnp.zeros(M, np.int32)
    lo = jnp.zeros(M, np.float32)
    hi = jnp.full(M, 4096.0, np.float32)
    L = hi - lo
    zi = jnp.zeros(M, np.int32)
    oi = jnp.ones(M, np.int32)
    return dict(inc=inc, phase0=phase0, fin0=fin0, lo=lo, hi=hi, L=L,
                osn=zi, one_shot=zi, adv=oi, act=oi)


def fsdata():
    x = jnp.asarray(rng.normal(size=(N, M)).astype(np.float32) * 0.3)
    env = jnp.asarray(rng.uniform(0, 1, (N, M)).astype(np.float32))
    alive = jnp.ones((N, M), jnp.int32)
    vec = lambda v: jnp.full(M, v, np.float32)
    return dict(x=x, env=env, alive=alive, b0=vec(0.2), b1=vec(0.3),
                b2=vec(0.1), na1=vec(0.5), na2=vec(-0.2),
                use_flt=jnp.ones(M, jnp.int32), use_sm=jnp.ones(M, jnp.int32),
                amp=vec(0.8), smoothing=vec(0.01),
                x1=vec(0), x2=vec(0), y1=vec(0), y2=vec(0), sg=vec(0))


def lutdata(n_tables=10, B=None):
    B = B or (M // 10)
    nt = max(M // B, 1)
    tab = rng.normal(size=(n_tables, 32, 128)).astype(np.float32)
    slot = np.repeat(np.arange(nt, dtype=np.int32) % n_tables, B)[:M]
    # window ~ inc*N wide starting at a random base, like a real block
    base = rng.integers(0, 4096, M)
    span = rng.integers(1, 900, M)
    idxs = (base[:, None] + (np.arange(N)[None, :] * span[:, None] // N)) % 4096
    return (jnp.asarray(tab), jnp.asarray(slot),
            jnp.asarray(idxs.astype(np.int32)))


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(float(jnp.sum(jnp.abs(l.astype(F32)))) for l in leaves))


def bench(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    force(out)
    tc = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    force(out)
    wall = time.time() - t0
    print(f"{label:28s} {wall / REPS * 1e3:8.3f} ms/block  "
          f"(compile+first {tc:.1f}s)", flush=True)
    return wall / REPS


def main():
    print(f"backend={jax.default_backend()} M={M} N={N} reps={REPS}")
    pd = mkdata()
    fd = fsdata()
    tab, slot, idxs = lutdata()

    # --- phase 2d vs 3d (scan REPS blocks, phase threads through) ---
    @jax.jit
    def phase2d_scan(d):
        def step(ph0, _):
            ph, dead, ph_e, fin_e = K.phase_walk_pallas(
                d["inc"], ph0, d["fin0"], d["lo"], d["hi"], d["L"],
                d["osn"], d["one_shot"], d["adv"], d["act"],
                fm=True, finish=True)
            return ph_e, jnp.sum(ph[0])
        ph_e, sums = jax.lax.scan(step, d["phase0"], None, length=REPS)
        return ph_e, sums

    @jax.jit
    def phase3d_scan(d):
        def step(ph0, _):
            ph, dead, ph_e, fin_e = phase_walk_3d(
                d["inc"], ph0, d["fin0"], d["lo"], d["hi"], d["L"],
                d["osn"], d["one_shot"], d["adv"], d["act"])
            return ph_e, jnp.sum(ph[0])
        ph_e, sums = jax.lax.scan(step, d["phase0"], None, length=REPS)
        return ph_e, sums

    if CHECK:
        a = phase2d_scan(pd)
        b = phase3d_scan(pd)
        err = max(float(jnp.max(jnp.abs(a[0] - b[0]))),
                  float(jnp.max(jnp.abs(a[1] - b[1]))))
        print(f"phase prod vs 3d-proto max err: {err:.3e}")
    else:
        bench(f"phase prod (U={K.UNROLL})", phase2d_scan, pd)
        bench("phase 3d-proto (U=1)", phase3d_scan, pd)

    # --- fs 2d vs 3d ---
    def fs2d_call(d, x, st, exact=True):
        return K.filt_smooth_pallas(
            x, d["env"], None, d["alive"], d["b0"], d["b1"], d["b2"],
            d["na1"], d["na2"], d["use_flt"], d["use_sm"], d["amp"],
            d["smoothing"], None, None, None, None, None, None, None,
            st[0], st[1], st[2], st[3], st[4], None, None,
            exact=exact, feat=FSFEAT)

    def make_fs_scan(exact):
        @jax.jit
        def fs2d_scan(d):
            def step(c, _):
                x, st = c
                outs = fs2d_call(d, x, st, exact)
                return (outs[0], (outs[1], outs[2], outs[3], outs[4],
                                  outs[5])), jnp.sum(outs[0][0])
            (x, st), sums = jax.lax.scan(
                step, (d["x"], (d["x1"], d["x2"], d["y1"], d["y2"],
                                d["sg"])), None, length=REPS)
            return st, sums
        return fs2d_scan

    fs2d_scan = make_fs_scan(True)
    fs2d_fast = make_fs_scan(False)

    @jax.jit
    def fs3d_scan(d):
        def step(c, _):
            x, st = c
            outs = fs_3d(x, d["env"], d["alive"], d["b0"], d["b1"], d["b2"],
                         d["na1"], d["na2"], d["use_flt"], d["use_sm"],
                         d["amp"], d["smoothing"], st[0], st[1], st[2],
                         st[3], st[4])
            return (outs[0], tuple(outs[1:6])), jnp.sum(outs[0][0])
        (x, st), sums = jax.lax.scan(
            step, (d["x"], (d["x1"], d["x2"], d["y1"], d["y2"], d["sg"])),
            None, length=REPS)
        return st, sums

    if CHECK:
        a = fs2d_scan(fd)
        b = fs3d_scan(fd)
        err = max(float(jnp.max(jnp.abs(x - y)))
                  for x, y in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)))
        print(f"fs prod vs 3d-proto max err: {err:.3e}")
    else:
        bench(f"fs prod exact (U={K.UNROLL})", fs2d_scan, fd)
        bench(f"fs prod fast (U={K.UNROLL})", fs2d_fast, fd)
        bench("fs 3d-proto (U=1)", fs3d_scan, fd)

    # --- LUT grouped (G=16) vs v3 windowed ---
    @jax.jit
    def lut_g16_scan(t, s, i0):
        def step(i, _):
            f = K.table_lookup_grouped(t, s, i)
            i2 = jnp.clip((i + f.astype(I32) + 1) % 4096, 0, 4095)
            return i2, jnp.sum(f[0])
        i, sums = jax.lax.scan(step, i0, None, length=REPS)
        return i, sums

    @jax.jit
    def lut_v4_scan(t, s, i0):
        def step(i, _):
            f = table_lookup_v4(t, s, i)
            i2 = jnp.clip((i + f.astype(I32) + 1) % 4096, 0, 4095)
            return i2, jnp.sum(f[0])
        i, sums = jax.lax.scan(step, i0, None, length=REPS)
        return i, sums

    if CHECK:
        a = lut_g16_scan(tab, slot, idxs)
        b = lut_v4_scan(tab, slot, idxs)
        err = max(float(jnp.max(jnp.abs(a[0] - b[0]))),
                  float(jnp.max(jnp.abs(a[1] - b[1]))))
        print(f"lut v4 vs grouped max err: {err:.3e}")
    else:
        bench("lut grouped (G=16)", lut_g16_scan, tab, slot, idxs)
        bench("lut v4 prefetch-win G=64", lut_v4_scan, tab, slot, idxs)


if __name__ == "__main__":
    main()
