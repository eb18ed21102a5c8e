"""Pallas TPU kernels for the per-sample recurrences.

The fused engine keeps almost everything block-parallel; only two true
recurrences remain — the oscillator phase walk and the biquad+smoother
chain.  As XLA while-loops these cost ~20 µs/iteration on TPU (HBM
round-trips per step); as Pallas kernels the whole 512-sample loop runs
out of VMEM at VPU speed.

Data layout: time-major ``[N, M]`` where M = batch·voices lanes (padded
to the 128-lane tile), so each loop step reads one contiguous row.
The kernels implement the same op sequences as engine/fused.py's
``ph_step`` / ``fs_step`` (reference: osc_next synth.c:217-258,
mmf_process synth.c:349-364, smoother synth.c:589-592).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

LANES = 512          # lanes per grid step (4 VPU registers wide)


def _phase_kernel(inc_ref, phase0_ref, fin0_ref, lo_ref, hi_ref, l_ref,
                  osn_ref, oneshot_ref, adv_ref, act_ref,
                  ph_out_ref, dead_out_ref, phase_end_ref, fin_end_ref):
    n = inc_ref.shape[0]
    lo = lo_ref[0, :]
    hi = hi_ref[0, :]
    L = l_ref[0, :]
    osn = osn_ref[0, :] != 0
    one_shot = oneshot_ref[0, :] != 0
    adv = adv_ref[0, :] != 0
    act = act_ref[0, :] != 0

    def body(t, carry):
        ph_c, fin_c = carry                      # fin_c: int32 0/1
        inc_t = inc_ref[t, :]
        ph = ph_c + inc_t
        bad = ~jnp.isfinite(ph)
        over = ph >= hi
        under = ph < lo
        wrap_over = lo + jnp.fmod(ph - lo, L)
        wrap_under = hi - jnp.fmod(lo - ph, L)
        ph2 = jnp.where(over, jnp.where(osn, hi - F32(1e-6), wrap_over),
                        jnp.where(under, jnp.where(osn, lo, wrap_under), ph))
        ph2 = jnp.where(bad, F32(0.0), ph2)
        fin_new = (bad & one_shot) | ((over | under) & osn)
        fin_b = fin_c != 0
        step_on = adv & ~fin_b
        dead_t = fin_b | ~act
        ph_keep = jnp.where(step_on, ph2, ph_c)
        fin_keep = jnp.where(step_on & fin_new, jnp.int32(1), fin_c)
        ph_out_ref[t, :] = ph2
        dead_out_ref[t, :] = dead_t.astype(I32)
        return ph_keep, fin_keep

    ph_e, fin_e = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body,
        (phase0_ref[0, :], fin0_ref[0, :]))
    phase_end_ref[0, :] = ph_e
    fin_end_ref[0, :] = fin_e


INTERPRET = False    # set True to run kernels in interpreter mode (tests)


@functools.partial(jax.jit, static_argnames=())
def phase_walk_pallas(inc, phase0, fin0, lo, hi, L, osn, one_shot, adv, act):
    """inc: [N, M]; everything else [M].  M must be a multiple of LANES.
    Returns (ph [N, M], dead [N, M] i32, phase_end [M], fin_end [M])."""
    n, m = inc.shape
    grid = (m // LANES,)
    seq = pl.BlockSpec((n, LANES), lambda i: (i * 0, i))
    vec = pl.BlockSpec((1, LANES), lambda i: (i * 0, i))
    out = pl.pallas_call(
        _phase_kernel,
        grid=grid,
        in_specs=[seq] + [vec] * 9,
        out_specs=[seq, seq, vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), jnp.float32),
            jax.ShapeDtypeStruct((n, m), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ],
        interpret=INTERPRET,
    )(inc, phase0[None, :], fin0[None, :], lo[None, :], hi[None, :],
      L[None, :], osn[None, :], one_shot[None, :], adv[None, :], act[None, :])
    ph, dead, ph_end, fin_end = out
    return ph, dead, ph_end[0], fin_end[0]


def _fs_kernel(x_ref, env_ref, amod_ref, alive_ref,
               b0_ref, b1_ref, b2_ref, na1_ref, na2_ref,
               useflt_ref, usesm_ref, amp_ref, smoothing_ref,
               amself_ref, amdepth_ref,
               x1_ref, x2_ref, y1_ref, y2_ref, sg_ref,
               out_ref, x1o_ref, x2o_ref, y1o_ref, y2o_ref, sgo_ref):
    n = x_ref.shape[0]
    b0 = b0_ref[0, :]
    b1 = b1_ref[0, :]
    b2 = b2_ref[0, :]
    na1 = na1_ref[0, :]
    na2 = na2_ref[0, :]
    use_flt = useflt_ref[0, :] != 0
    use_sm = usesm_ref[0, :] != 0
    amp = amp_ref[0, :]
    smoothing = smoothing_ref[0, :]
    am_self = amself_ref[0, :] != 0
    am_depth = amdepth_ref[0, :]

    def body(t, carry):
        x1, x2, y1, y2, sg = carry
        x_t = x_ref[t, :]
        alive_t = alive_ref[t, :] != 0
        flt = b1 * x1 + b0 * x_t + b2 * x2 + na1 * y1 + na2 * y2
        s3 = jnp.where(use_flt, flt, x_t)
        upd = alive_t & use_flt
        nx1 = jnp.where(upd, x_t, x1)
        nx2 = jnp.where(upd, x1, x2)
        ny1 = jnp.where(upd, flt, y1)
        ny2 = jnp.where(upd, y1, y2)
        amod = jnp.where(am_self, s3 * am_depth, amod_ref[t, :])
        final_t = amp * env_ref[t, :] * amod
        sg2 = sg + smoothing * (final_t - sg)
        final2 = jnp.where(use_sm, sg2, final_t)
        nsg = jnp.where(alive_t & use_sm, sg2, sg)
        out_ref[t, :] = jnp.where(alive_t, s3 * final2, F32(0.0))
        return nx1, nx2, ny1, ny2, nsg

    x1, x2, y1, y2, sg = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body,
        (x1_ref[0, :], x2_ref[0, :], y1_ref[0, :], y2_ref[0, :], sg_ref[0, :]))
    x1o_ref[0, :] = x1
    x2o_ref[0, :] = x2
    y1o_ref[0, :] = y1
    y2o_ref[0, :] = y2
    sgo_ref[0, :] = sg


@functools.partial(jax.jit, static_argnames=())
def filt_smooth_pallas(x, env, amod, alive, b0, b1, b2, na1, na2,
                       use_flt, use_sm, amp, smoothing, am_self, am_depth,
                       x1, x2, y1, y2, sg):
    """x/env/amod/alive: [N, M]; params/state: [M].  Returns
    (samples [N, M], x1, x2, y1, y2, sg)."""
    n, m = x.shape
    grid = (m // LANES,)
    seq = pl.BlockSpec((n, LANES), lambda i: (i * 0, i))
    vec = pl.BlockSpec((1, LANES), lambda i: (i * 0, i))
    outs = pl.pallas_call(
        _fs_kernel,
        grid=grid,
        in_specs=[seq, seq, seq, seq] + [vec] * 16,
        out_specs=[seq] + [vec] * 5,
        out_shape=[jax.ShapeDtypeStruct((n, m), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, m), jnp.float32)] * 5,
        interpret=INTERPRET,
    )(x, env, amod, alive,
      b0[None, :], b1[None, :], b2[None, :], na1[None, :], na2[None, :],
      use_flt[None, :], use_sm[None, :], amp[None, :], smoothing[None, :],
      am_self[None, :], am_depth[None, :],
      x1[None, :], x2[None, :], y1[None, :], y2[None, :], sg[None, :])
    samples = outs[0]
    return (samples,) + tuple(o[0] for o in outs[1:])


def to_time_major(a: jnp.ndarray) -> jnp.ndarray:
    """[B, V, N] → [N, B*V]."""
    b, v, n = a.shape
    return jnp.moveaxis(a, -1, 0).reshape(n, b * v)


def from_time_major(a: jnp.ndarray, b: int, v: int) -> jnp.ndarray:
    """[N, B*V] → [B, V, N]."""
    n = a.shape[0]
    return jnp.moveaxis(a.reshape(n, b, v), 0, -1)
