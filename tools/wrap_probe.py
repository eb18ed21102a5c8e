#!/usr/bin/env python3
"""Latency probe for the tier megakernel's serial loops.

The slowest bench buckets sit at ~12% VPU / ~5% HBM utilization
(bench_detail.json roofline) — latency-bound on the per-sample serial
chains, not resource-bound.  This probe times each serial phase of
_make_tier_kernel in isolation at heavy-bucket shape (n=512 samples,
sub=32 sublane rows = 4096 lanes/step) to find where the cycles go:

  empty        fori-loop + scratch-write floor
  phase-fmod   phase-1 walk as shipped (jnp.fmod wrap on the chain)
  phase-sub    phase-1 walk with single conditional-subtract wrap
               (bit-identical when |inc| <= L — Sterbenz: for
               d in [L, 2L), fmod(d, L) == d - L exactly, and for
               d in (-L, 0), fmod(d, L) == d exactly)
  fs-exact     phase-4 loop (hold+quant+biquad+env+smoother) with the
               software correctly-rounded fma (_kfma, ~30 vector ops) at
               the 5 gcc-contracted sites — what exact=True ships
  fs-exact-nodiv  same with env divides as reciprocal multiplies
  fs-fast      phase-4 with plain a*b+c at the fma sites (exact=False)

Usage: python tools/wrap_probe.py [reps]
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 172

import jax

cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skred_tpu.engine.kernels import _kfma

import os

F32 = jnp.float32
I32 = jnp.int32
N = 512
SUB = int(os.environ.get("PROBE_SUB", "32"))
UNROLL = int(os.environ.get("PROBE_UNROLL", "4"))


def _mk(body_builder):
    """Wrap a per-sample body into a pallas kernel over (N, SUB, 128)."""

    def kernel(inc_ref, st_ref, out_ref, ph_end, scratch):
        init = (st_ref[0], jnp.zeros_like(st_ref[0], I32),
                st_ref[0], st_ref[0], st_ref[0], st_ref[0], st_ref[0])
        body = body_builder(inc_ref, scratch)

        def stepu(q, c):
            t0 = q * jnp.int32(UNROLL)
            for u in range(UNROLL):
                c = body(t0 + jnp.int32(u), c)
            return c

        fin = jax.lax.fori_loop(jnp.int32(0), jnp.int32(N // UNROLL),
                                stepu, init)
        ph_end[0] = fin[0]
        out_ref[0] = scratch[N - 1]

    @jax.jit
    def run(inc, st):
        seq = pl.BlockSpec((N, SUB, 128), lambda: (0, 0, 0))
        vec = pl.BlockSpec((1, SUB, 128), lambda: (0, 0, 0))
        out, ph = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[seq, vec],
            out_specs=[vec, vec],
            out_shape=[jax.ShapeDtypeStruct((1, SUB, 128), F32)] * 2,
            scratch_shapes=[pltpu.VMEM((N, SUB, 128), F32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(inc, st)
        return out, ph

    def timed(label):
        inc = jnp.asarray(np.random.uniform(0.5, 2.0, (N, SUB, 128)),
                          F32)
        st = jnp.asarray(np.random.uniform(0, 4096, (1, SUB, 128)), F32)

        def chain(reps):
            def step(c, _):
                o, p = run(inc, c)
                return p, o[0, 0, 0]

            p, os_ = jax.lax.scan(step, st, None, length=reps)
            return jnp.sum(os_) + jnp.sum(p)

        cf = jax.jit(chain, static_argnums=0)
        # warm with the SAME static rep count: static_argnums makes
        # cf(2) and cf(REPS) different compilations, so a cf(2) warm
        # would leave the timed call paying its own compile
        float(cf(REPS))
        wall = float("inf")
        s = None
        for _ in range(2):                # best-of-2 (tunnel stalls)
            t0 = time.time()
            s = float(cf(REPS))
            wall = min(wall, time.time() - t0)
        ns = wall / (REPS * N * SUB * 128) * 1e9
        print(f"{label:14s} wall={wall:7.3f}s  {ns:6.3f} ns/lane-sample "
              f"(sum {s:.3e})")
        return wall

    return timed


# Python floats (weak literals) — exactly-representable values, so the
# math is identical; np.float32 module scalars would be lifted as pallas
# consts (see b_phase_fmod_xfma)
LO, HI = 0.0, 4096.0
L = 4096.0


def b_empty(inc_ref, scratch):
    def body(t, c):
        ph = c[0] + inc_ref[t]
        scratch[t] = ph
        return (ph,) + c[1:]
    return body


def _mk_batched(nacc: int):
    """Like _mk(b_empty) but with ONE dynamic-sliced read + write per
    UNROLL group instead of one per sample — tests whether the serial
    loops are bound by per-access scalar-unit address computation.
    ``nacc`` extra scratch reads per group emulate heavier kernels."""

    def kernel(inc_ref, st_ref, out_ref, ph_end, scratch):
        def stepu(q, c):
            t0 = q * jnp.int32(UNROLL)
            blk = inc_ref[pl.ds(t0, UNROLL)]          # one sliced read
            ph = c
            outs = []
            for u in range(UNROLL):
                ph = ph + blk[u]
                outs.append(ph)
            for _ in range(nacc):                     # extra batched reads
                ph = ph + jnp.sum(inc_ref[pl.ds(t0, UNROLL)]) * F32(0.0)
            scratch[pl.ds(t0, UNROLL)] = jnp.stack(outs)  # one sliced write
            return ph

        fin = jax.lax.fori_loop(jnp.int32(0), jnp.int32(N // UNROLL),
                                stepu, st_ref[0])
        ph_end[0] = fin
        out_ref[0] = scratch[N - 1]

    @jax.jit
    def run(inc, st):
        seq = pl.BlockSpec((N, SUB, 128), lambda: (0, 0, 0))
        vec = pl.BlockSpec((1, SUB, 128), lambda: (0, 0, 0))
        out, ph = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[seq, vec],
            out_specs=[vec, vec],
            out_shape=[jax.ShapeDtypeStruct((1, SUB, 128), F32)] * 2,
            scratch_shapes=[pltpu.VMEM((N, SUB, 128), F32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(inc, st)
        return out, ph

    def timed(label):
        inc = jnp.asarray(np.random.uniform(0.5, 2.0, (N, SUB, 128)), F32)
        st = jnp.asarray(np.random.uniform(0, 4096, (1, SUB, 128)), F32)

        def chain(reps):
            def step(c, _):
                o, p = run(inc, c)
                return p, o[0, 0, 0]

            p, os_ = jax.lax.scan(step, st, None, length=reps)
            return jnp.sum(os_) + jnp.sum(p)

        cf = jax.jit(chain, static_argnums=0)
        float(cf(REPS))
        wall = float("inf")
        for _ in range(2):
            t0 = time.time()
            s = float(cf(REPS))
            wall = min(wall, time.time() - t0)
        ns = wall / (REPS * N * SUB * 128) * 1e9
        print(f"{label:14s} wall={wall:7.3f}s  {ns:6.3f} ns/lane-sample "
              f"(sum {s:.3e})")
        return wall

    return timed


def b_phase_fmod(inc_ref, scratch):
    def body(t, c):
        ph_c, fin_c = c[0], c[1]
        ph = ph_c + inc_ref[t]
        bad = ~jnp.isfinite(ph)
        over = ph >= HI
        under = ph < LO
        r = jnp.fmod(ph - LO, L)
        ph2 = jnp.where(over, LO + r, jnp.where(under, HI + r, ph))
        ph2 = jnp.where(bad, F32(0.0), ph2)
        fin_new = (over | under)
        fin_keep = jnp.where(fin_new & (fin_c != 0), jnp.int32(1), fin_c)
        scratch[t] = ph2
        return (ph2, fin_keep) + c[2:]
    return body


def b_phase_fmod_xfma(inc_ref, scratch):
    """Phase walk as the FM tier ships it in exact mode: the per-sample
    increment fma (synth.c:548-555) is the software correctly-rounded
    _kfma, ON the serial chain, plus the fmod wrap."""
    # Python floats (weak literals): np.float32 scalars built outside the
    # kernel trace get lifted as pallas consts, which Mosaic rejects
    mis, pinc, fmdep = 0.5, 1.1, 0.25

    def body(t, c):
        ph_c, fin_c = c[0], c[1]
        g = inc_ref[t] * fmdep
        inc_t = _kfma(mis, g, pinc)
        ph = ph_c + inc_t
        bad = ~jnp.isfinite(ph)
        over = ph >= HI
        under = ph < LO
        r = jnp.fmod(ph - LO, L)
        ph2 = jnp.where(over, LO + r, jnp.where(under, HI + r, ph))
        ph2 = jnp.where(bad, F32(0.0), ph2)
        fin_new = (over | under)
        fin_keep = jnp.where(fin_new & (fin_c != 0), jnp.int32(1), fin_c)
        scratch[t] = ph2
        return (ph2, fin_keep) + c[2:]
    return body


def b_phase_sub(inc_ref, scratch):
    def body(t, c):
        ph_c, fin_c = c[0], c[1]
        ph = ph_c + inc_ref[t]
        bad = ~jnp.isfinite(ph)
        over = ph >= HI
        under = ph < LO
        d = ph - LO
        r = jnp.where(d >= L, d - L, d)
        ph2 = jnp.where(over, LO + r, jnp.where(under, HI + r, ph))
        ph2 = jnp.where(bad, F32(0.0), ph2)
        fin_new = (over | under)
        fin_keep = jnp.where(fin_new & (fin_c != 0), jnp.int32(1), fin_c)
        scratch[t] = ph2
        return (ph2, fin_keep) + c[2:]
    return body


def _fs(div: bool, exact: bool = True):
    fma = _kfma if exact else (lambda a, b, c: a * b + c)
    # Python scalars (weak literals) — see b_phase_fmod_xfma
    b0, b1, b2 = 0.2, 0.3, 0.1
    na1, na2 = -0.4, 0.05
    att, dec, sus, rel = 100.0, 200.0, 0.5, 300.0
    iatt, idec, irel = 0.01, 0.005, 1.0 / 300.0
    smoothing = 0.02
    levels, inv_lev = 127.0, 1.0 / 127.0
    hmax = 7

    def build(inc_ref, scratch):
        def body(t, c):
            _, hc_i, x1, x2, y1, y2, sg = c
            hc = hc_i
            f_t = inc_ref[t]
            # hold
            is_h = hc == 0
            hv2 = jnp.where(is_h, f_t, x1)
            hcn = hc + jnp.int32(1)
            hcn = jnp.where(hcn >= hmax, jnp.int32(0), hcn)
            s1 = hv2
            # quant (the production kernel uses _kfma here regardless of
            # exact — synth.c:341 rounds via int truncation of s*l+0.5)
            iv = _kfma(s1, levels, F32(0.5)).astype(I32).astype(F32)
            x_t = iv * inv_lev
            # biquad
            fv = b1 * x1
            fv = fma(b0, x_t, fv)
            fv = fma(b2, x2, fv)
            fv = fma(na1, y1, fv)
            fv = fma(na2, y2, fv)
            # env closed form
            tf = (jnp.float32(t) + f_t)
            if div:
                v = jnp.where(tf < att, tf / att,
                              jnp.where(tf < att + dec,
                                        _kfma(-((tf - att) / dec),
                                              F32(0.5), F32(1.0)),
                                        sus * (F32(1.0) - tf / rel)))
            else:
                v = jnp.where(tf < att, tf * iatt,
                              jnp.where(tf < att + dec,
                                        _kfma(-((tf - att) * idec),
                                              F32(0.5), F32(1.0)),
                                        sus * _kfma(-tf, irel, F32(1.0))))
            final = fv * v
            sg2 = fma(smoothing, final - sg, sg)
            scratch[t] = fv * sg2
            return (fv, hcn, x_t, x1, fv, y1, sg2)
        return body
    return build


def main():
    print(f"device: {jax.devices()[0].device_kind}, shape=({N},{SUB},128), "
          f"reps={REPS}")
    results = {}
    results_b = {}
    for label, nacc in [("batched", 0)]:
        results_b[label] = _mk_batched(nacc)(label)
    for label, builder in [
        ("empty", b_empty),
        ("phase-fmod", b_phase_fmod),
        ("phase-xfma", b_phase_fmod_xfma),
        ("phase-sub", b_phase_sub),
        ("fs-exact", _fs(True, True)),
        ("fs-exact-nodiv", _fs(False, True)),
        ("fs-fast", _fs(True, False)),
        ("fs-fast-nodiv", _fs(False, False)),
    ]:
        results[label] = _mk(builder)(label)
    print(f"\nphase wrap: fmod {results['phase-fmod']:.3f}s vs "
          f"sub {results['phase-sub']:.3f}s "
          f"({results['phase-fmod'] / results['phase-sub']:.2f}x)")
    print(f"env divide (exact): {results['fs-exact']:.3f}s vs "
          f"nodiv {results['fs-exact-nodiv']:.3f}s "
          f"({results['fs-exact'] / results['fs-exact-nodiv']:.2f}x)")
    print(f"software fma: exact {results['fs-exact']:.3f}s vs "
          f"fast {results['fs-fast']:.3f}s "
          f"({results['fs-exact'] / results['fs-fast']:.2f}x)")


if __name__ == "__main__":
    main()
