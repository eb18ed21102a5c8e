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


def _kfma(a, b, c):
    """In-kernel correctly-rounded f32 fma (render._fma32, f32/i32 only —
    Mosaic has no f64).  Used for the reference binary's gcc-contracted
    sites: the biquad chain and the amp smoother (mmf_process
    synth.c:349-364, smoother synth.c:589-592)."""
    C = F32(4097.0)
    g = a * C
    ah = g - (g - a)
    al = a - ah
    g = b * C
    bh = g - (g - b)
    bl = b - bh
    p = a * b
    # bitcast round-trip: hides the mul from Mosaic's fuser so `p + c`
    # cannot be contracted into an fma (which would break the TwoSum)
    p = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(p, I32), F32)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    s = p + c
    bv = s - p
    err = (p - (s - bv)) + (c - bv)
    t = err + e
    bv2 = t - err
    r = (err - (t - bv2)) + (e - bv2)
    ti = jax.lax.bitcast_convert_type(t, I32)
    need = (r != 0.0) & ((ti & jnp.int32(1)) == 0) & jnp.isfinite(t)
    up = (r > 0.0) != (t < 0.0)
    adj = jnp.where(up, ti + jnp.int32(1), ti - jnp.int32(1))
    t = jnp.where(need, jax.lax.bitcast_convert_type(adj, F32), t)
    return s + t

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
    assert m % LANES == 0, f"lanes {m} not a multiple of {LANES} (pad batch)"
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


def _make_fs_kernel(exact):
    fma = _kfma if exact else (lambda a, b, c: a * b + c)

    def kernel(x_ref, env_ref, amod_ref, alive_ref,
               b0_ref, b1_ref, b2_ref, na1_ref, na2_ref,
               useflt_ref, usesm_ref, amp_ref, smoothing_ref,
               amself_ref, amdepth_ref,
               holdon_ref, holdmax_ref, quant_ref, levels_ref, invlev_ref,
               x1_ref, x2_ref, y1_ref, y2_ref, sg_ref, hc_ref, hv_ref,
               out_ref, x1o_ref, x2o_ref, y1o_ref, y2o_ref, sgo_ref,
               hco_ref, hvo_ref):
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
        hold_on = holdon_ref[0, :] != 0
        hmax = holdmax_ref[0, :]
        quant_on = quant_ref[0, :] != 0
        levels = levels_ref[0, :]
        inv_lev = invlev_ref[0, :]

        def body(t, carry):
            x1, x2, y1, y2, sg, hc, hv = carry
            f_t = x_ref[t, :]
            alive_t = alive_ref[t, :] != 0
            # sample & hold (synth.c:560-571): refresh on counter wrap,
            # advance only while the voice is alive
            is_h = hold_on & (hc == 0)
            hv2 = jnp.where(is_h, f_t, hv)
            s1 = jnp.where(hold_on, hv2, f_t)
            hcn = hc + jnp.int32(1)
            hcn = jnp.where(hcn >= hmax, jnp.int32(0), hcn)
            nhv = jnp.where(alive_t, hv2, hv)
            nhc = jnp.where(alive_t & hold_on, hcn, hc)
            # bit quantizer (synth.c:341-345) — gcc contracts the
            # multiply-add, so always the exact fma
            iv = _kfma(s1, levels, F32(0.5)).astype(I32).astype(F32)
            x_t = jnp.where(quant_on, iv * inv_lev, s1)
            # gcc -O3 order: b1*x1 rounded separately, then an fma chain
            flt = b1 * x1
            flt = fma(b0, x_t, flt)
            flt = fma(b2, x2, flt)
            flt = fma(na1, y1, flt)
            flt = fma(na2, y2, flt)
            s3 = jnp.where(use_flt, flt, x_t)
            upd = alive_t & use_flt
            nx1 = jnp.where(upd, x_t, x1)
            nx2 = jnp.where(upd, x1, x2)
            ny1 = jnp.where(upd, flt, y1)
            ny2 = jnp.where(upd, y1, y2)
            amod = jnp.where(am_self, s3 * am_depth, amod_ref[t, :])
            final_t = amp * env_ref[t, :] * amod
            sg2 = fma(smoothing, final_t - sg, sg)
            final2 = jnp.where(use_sm, sg2, final_t)
            nsg = jnp.where(alive_t & use_sm, sg2, sg)
            out_ref[t, :] = jnp.where(alive_t, s3 * final2, F32(0.0))
            return nx1, nx2, ny1, ny2, nsg, nhc, nhv

        x1, x2, y1, y2, sg, hc, hv = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n), body,
            (x1_ref[0, :], x2_ref[0, :], y1_ref[0, :], y2_ref[0, :],
             sg_ref[0, :], hc_ref[0, :], hv_ref[0, :]))
        x1o_ref[0, :] = x1
        x2o_ref[0, :] = x2
        y1o_ref[0, :] = y1
        y2o_ref[0, :] = y2
        sgo_ref[0, :] = sg
        hco_ref[0, :] = hc
        hvo_ref[0, :] = hv

    return kernel


_FS_KERNELS = {False: _make_fs_kernel(False), True: _make_fs_kernel(True)}


@functools.partial(jax.jit, static_argnames=("exact",))
def filt_smooth_pallas(x, env, amod, alive, b0, b1, b2, na1, na2,
                       use_flt, use_sm, amp, smoothing, am_self, am_depth,
                       hold_on, hold_max, quant_on, levels, inv_levels,
                       x1, x2, y1, y2, sg, hc, hv, exact=False):
    """Sample&hold + quantizer + biquad + amp smoother in one serial pass.

    x/env/amod/alive: [N, M]; params/state: [M].  Returns
    (samples [N, M], x1, x2, y1, y2, sg, hold_count, hold_val)."""
    n, m = x.shape
    assert m % LANES == 0, f"lanes {m} not a multiple of {LANES} (pad batch)"
    grid = (m // LANES,)
    seq = pl.BlockSpec((n, LANES), lambda i: (i * 0, i))
    vec = pl.BlockSpec((1, LANES), lambda i: (i * 0, i))
    outs = pl.pallas_call(
        _FS_KERNELS[bool(exact)],
        grid=grid,
        in_specs=[seq, seq, seq, seq] + [vec] * 23,
        out_specs=[seq] + [vec] * 7,
        out_shape=[jax.ShapeDtypeStruct((n, m), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, m), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((1, m), jnp.int32),
           jax.ShapeDtypeStruct((1, m), jnp.float32)],
        interpret=INTERPRET,
    )(x, env, amod, alive,
      b0[None, :], b1[None, :], b2[None, :], na1[None, :], na2[None, :],
      use_flt[None, :], use_sm[None, :], amp[None, :], smoothing[None, :],
      am_self[None, :], am_depth[None, :],
      hold_on[None, :], hold_max[None, :], quant_on[None, :],
      levels[None, :], inv_levels[None, :],
      x1[None, :], x2[None, :], y1[None, :], y2[None, :], sg[None, :],
      hc[None, :], hv[None, :])
    samples = outs[0]
    return (samples,) + tuple(o[0] for o in outs[1:])


SLOT = 4096          # small-table slot: sine/saw/square/korg waves
SLOT_MED = 32768     # medium-table slot: most sampled PCM fits here


def _make_lut_kernel(slot_rows):
    def kernel(slot_ref, tab_ref, idx_ref, out_ref):
        del slot_ref                         # consumed by the index maps
        t = tab_ref[0]                       # [slot_rows, 128]
        i = idx_ref[0]                       # [R, 128] i32 sample indices
        hi = jax.lax.shift_right_logical(i, jnp.int32(7))
        lo = jax.lax.bitwise_and(i, jnp.int32(127))
        acc = jnp.zeros(i.shape, jnp.float32)
        # masked lane-gathers: Mosaic supports dynamic per-lane gather only
        # within one 128-lane row, so resolve each 128-entry chunk of the
        # table in turn (hi >= slot_rows, i.e. an out-of-tier index, never
        # matches and yields 0 — those voices resolve through a wider tier
        # or the XLA gather roster).  Raw lax.gather with i32 indices:
        # under jax_enable_x64 jnp.take_along_axis promotes indices to
        # i64, which Mosaic rejects.
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        for c in range(slot_rows):
            bc = jnp.broadcast_to(t[c:c + 1, :], i.shape)
            g = jax.lax.gather(
                bc, lo[..., None], dnums, slice_sizes=(1, 1),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            acc = jnp.where(hi == c, g, acc)
        out_ref[0] = acc

    return kernel


_LUT_KERNELS = {32: _make_lut_kernel(32), 256: _make_lut_kernel(256)}


@functools.partial(jax.jit, static_argnames=("slot_size",))
def table_lookup_pallas(table3, slot, idx, slot_size=SLOT):
    """Wavetable lookup out of VMEM instead of XLA's HBM gather.

    table3: [n_slots, slot_size//128, 128] — the stacked table buffer with
    every table aligned to its tier's slot (parallel/batch.py
    stack_timelines aligns tables <= 4096 samples to 4096 boundaries and
    everything larger to 32768); slot: [M] i32 per-voice slot index
    (table_off // slot_size), scalar-prefetched so each grid step DMAs
    exactly its voice's table; idx: [M, N] i32 clipped sample indices,
    N % 128 == 0.

    Returns [M, N] f32 with out[m, t] = buffer[slot[m]*slot_size+idx[m,t]]
    for idx < slot_size (0 otherwise).  Small tier: ~0.36 ns/lookup on
    v5e vs ~7 ns for the XLA gather (reference hot loop: osc_next table
    read, synth.c:217-258); the medium tier trades an 8x longer
    masked-gather loop for killing the HBM gather on sampled-PCM voices.
    """
    m, n = idx.shape
    r = n // 128
    rows = slot_size // 128
    idx3 = idx.reshape(m, r, 128)
    out = pl.pallas_call(
        _LUT_KERNELS[rows],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m,),
            in_specs=[
                # p*0 keeps the block indices i32 — bare 0 literals become
                # i64 under jax_enable_x64, which Mosaic rejects
                pl.BlockSpec((1, rows, 128),
                             lambda p, s: (s[p], p * 0, p * 0)),
                pl.BlockSpec((1, r, 128), lambda p, s: (p, p * 0, p * 0)),
            ],
            out_specs=pl.BlockSpec((1, r, 128), lambda p, s: (p, p * 0, p * 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, r, 128), jnp.float32),
        interpret=INTERPRET,
    )(slot, table3, idx3)
    return out.reshape(m, n)


def to_time_major(a: jnp.ndarray) -> jnp.ndarray:
    """[B, V, N] → [N, B*V]."""
    b, v, n = a.shape
    return jnp.moveaxis(a, -1, 0).reshape(n, b * v)


def from_time_major(a: jnp.ndarray, b: int, v: int) -> jnp.ndarray:
    """[N, B*V] → [B, V, N]."""
    n = a.shape[0]
    return jnp.moveaxis(a.reshape(n, b, v), 0, -1)
