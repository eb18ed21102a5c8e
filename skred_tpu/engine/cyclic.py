"""Cyclic-graph engine: 1-sample feedback loops at TPU speed.

The fused block engine cannot render cyclic modulation graphs (fb1.sk's
mutual-FM pair, fb2.sk's three-voice ring, fb3.sk's CZ self-feedback):
a block fixed-point over a cycle never converges to the reference's
serial per-frame semantics.  Round 3 fell back to the XLA compat scan
at ~4x realtime on chip — three orders of magnitude off the framework's
own bar.  This module closes that gap with a dedicated Pallas kernel
that runs the reference's per-frame voice loop (synth.c:526-612)
serially in VMEM, vectorized over BATCH ROWS (lanes = scripts):

  * one grid step = 1024 rows ((8,128) vregs); the sample loop walks a
    512-sample block carrying every voice's DSP state in registers;
  * per frame, voices evaluate in packed order (ascending ORIGINAL
    index — pack_stacked(cyclic=True)); modulator reads resolve
    same-frame values for lower-index targets and previous-frame values
    for delayed edges via the packed ``*_delayed`` flags, exactly the
    reference's rule.  A CZ SELF edge is delayed-by-construction
    (synth.c:263-264 reads voice_sample[dv] before the frame writes it),
    so self-feedback needs no special case;
  * each voice's table lives WHOLE in a VMEM window (win_rows_for: the
    bucket's largest table, DMA'd once per block — a 60k-sample PCM
    loop costs ~2 MiB of the 128 MiB chip); per-sample lookups gather
    per-lane columns with a dynamic row sweep bounded by the step's
    actual row spread;
  * arithmetic mirrors the compat scan engine site-for-site in exact
    mode: _kfma at the gcc-contracted sites, correctly-rounded divides
    (hoisted Markstein reciprocals for the CZ normalization), the
    envelope's closed form as in the tier megakernel.

Eligibility (cyclic_gate): per-voice table bindings uniform across the
batch (buckets are built per script identity) and the per-voice windows
within the VMEM budget (~96M samples across voices — far past any real
asset).  Ineligible cyclic scripts keep the compat fallback, loudly
(render_batch/bench warn per script).

Reference: /root/reference/synth.c:526-612 (frame loop), :217-275
(osc_next), :263-264 (CZ mod read, no self-guard).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skred_tpu import config as C
from skred_tpu.engine import kernels as K
from skred_tpu.engine.fused import (Feat, _apply_ops_b, _pack_by_dtype,
                                    compute_feat, make_carry0)
from skred_tpu.engine.render import _div32
from skred_tpu.host.timeline import noise_stream

F32 = jnp.float32
I32 = jnp.int32

SLOT_ROWS = K.SLOT_ROWS          # 256 rows x 128 = one 32768-sample window
ROWS_QUANTUM = K.LANE_QUANTUM    # 1024 batch rows per grid step

CYC_ABLATE = frozenset(
    x for x in os.environ.get("SKRED_CYC_ABLATE", "").split(",") if x)
#   Debug/timing-ablation ONLY (renders become invalid): "reads" stubs
#   cross-voice modulator reads, "lookup" the table gather, "cz" the
#   warp, "dsp" the hold/quant/filter/env/am/smoother pipeline, "pan"
#   per-sample pan, "all" the entire voice body (plumbing + DMA only).


WIN_BUDGET_BYTES = 48 * 1024 * 1024   # VMEM for the per-voice table
#                                       windows (128 MiB chip, leaving
#                                       room for the state registers and
#                                       Mosaic temporaries)


def win_rows_for(st) -> int:
    """Static per-bucket table-window height (128-sample rows): the
    largest bound table fits entirely in each voice's VMEM window (plus
    one row of headroom for the sub-row table_off offset), rounded to a
    DMA-friendly multiple of 8.  The reference's C loop indexes any
    table size directly (synth.c:548-556); sizing the window to the
    bucket removes the 32768-sample cliff round 4 shipped."""
    ts = int(np.asarray(st.params["table_size"]).max(initial=0))
    rows = -(-(ts + 128) // 128)
    return max(-(-rows // 8) * 8, SLOT_ROWS)


def cyclic_gate(st) -> Optional[str]:
    """None if the packed cyclic batch can take the Pallas kernel, else
    the reason it must stay on the compat scan engine."""
    p = st.params
    k = np.asarray(p["amp"]).shape[-1]
    need = k * win_rows_for(st) * 128 * 4
    if need > WIN_BUDGET_BYTES:
        return (f"table windows need {need >> 20} MiB VMEM "
                f"(budget {WIN_BUDGET_BYTES >> 20} MiB)")
    for name in ("table_off", "table_size"):
        a = np.asarray(p[name])
        if not bool((a == a[:1]).all()):
            return "per-voice table bindings differ across rows"
    return None


# ---------------------------------------------------------------------------
# kernel


def _feat_key(feat: Feat, k: int):
    return (feat.fm, feat.cz, feat.czm, feat.am, feat.am_self, feat.pm,
            feat.pm_self, feat.env, feat.flt, feat.sm, feat.hold,
            feat.quant, feat.noise, feat.finish, feat.direction, feat.disc,
            tuple(feat.cz_modes), k)


def _make_cyclic_kernel(fkey, n, exact, win_rows=SLOT_ROWS):
    (fm, cz, czm, am, am_self_f, pm, pm_self_f, env_a, flt, sm, hold,
     quant, noise, finish, dirn, disc, cz_modes, k) = fkey
    fma = K._kfma if exact else (lambda a, b, c: a * b + c)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def kernel(*refs):
        it = iter(refs)
        row0_sm = next(it)                   # [k] window base rows
        dloc_sm = next(it)                   # [k] table_off - row0*128
        cbase_sm = next(it)                  # [1] global sample count base
        noise_sm = next(it) if noise else None   # [n] i32 (f32 bits)
        tab_ref = next(it)                   # HBM [R, 128] flat buffer

        def vk(ref):
            """Per-voice (8,128) rows of a (k, 8, 128) vec block."""
            return [ref[v] for v in range(k)]

        amp = vk(next(it))
        pinc = vk(next(it))
        lo = vk(next(it))
        hi = vk(next(it))
        Lw = vk(next(it))
        clip_i = vk(next(it))
        if fm:
            fm_osc = vk(next(it))
            fm_del = vk(next(it))
            use_fm = vk(next(it))
            mis = vk(next(it))
            fm_dep = vk(next(it))
        if dirn:
            dirneg = vk(next(it))
        if cz:
            cz_mode = vk(next(it))
            cz_dist = vk(next(it))
            tsize = vk(next(it))
            inv_ts = vk(next(it))
            if czm:
                cm_osc = vk(next(it))
                cm_del = vk(next(it))
                cm_ge = vk(next(it))
                cm_dep = vk(next(it))
            else:
                dm_row = vk(next(it))
        if noise:
            is_noise = vk(next(it))
        if finish:
            one_shot = vk(next(it))
            osn = vk(next(it))
        if hold:
            hold_on = vk(next(it))
            hmax = vk(next(it))
        if quant:
            quant_on = vk(next(it))
            levels = vk(next(it))
            inv_lev = vk(next(it))
        if flt:
            b0 = vk(next(it))
            b1 = vk(next(it))
            b2 = vk(next(it))
            na1 = vk(next(it))
            na2 = vk(next(it))
            use_flt = vk(next(it))
        if env_a:
            use_env = vk(next(it))
            env_act = vk(next(it))
            env_start = vk(next(it))
            env_relat = vk(next(it))
            att = vk(next(it))
            dec = vk(next(it))
            sus = vk(next(it))
            rel = vk(next(it))
            vel = vk(next(it))
        if am:
            am_osc = vk(next(it))
            am_del = vk(next(it))
            am_dep = vk(next(it))
        if pm:
            pm_osc = vk(next(it))
            pm_del = vk(next(it))
            pm_dep = vk(next(it))
        if pm_self_f:
            pm_self = vk(next(it))
        if disc:
            disconn = vk(next(it))
        if sm:
            use_sm = vk(next(it))
            smoothing = vk(next(it))
        vf_ref = next(it)                    # (1, 8, 128) volume_final

        ph_in = next(it)
        prev_in = next(it)
        fin_in = next(it) if finish else None
        hc_in = next(it) if hold else None
        hv_in = next(it) if hold else None
        x1_in = next(it) if flt else None
        x2_in = next(it) if flt else None
        y1_in = next(it) if flt else None
        y2_in = next(it) if flt else None
        sg_in = next(it) if sm else None
        pnl_in = next(it)
        pnr_in = next(it)
        vg_in = next(it)

        out_l = next(it)                     # (n, 8, 128)
        out_r = next(it)
        ph_o = next(it)
        prev_o = next(it)
        fin_o = next(it) if finish else None
        hc_o = next(it) if hold else None
        hv_o = next(it) if hold else None
        x1_o = next(it) if flt else None
        x2_o = next(it) if flt else None
        y1_o = next(it) if flt else None
        y2_o = next(it) if flt else None
        sg_o = next(it) if sm else None
        pnl_o = next(it)
        pnr_o = next(it)
        vg_o = next(it)

        tab_ss = [next(it) for _ in range(k)]   # k x VMEM (SLOT_ROWS, 128)
        sem = next(it)

        p = pl.program_id(0)

        @pl.when(p == 0)
        def _fetch_tables():
            for v in range(k):
                # explicit i32: x64 mode makes bare python-int / SMEM
                # scalar index arithmetic i64, which tpu.memref_slice
                # rejects on real hardware (interpret mode tolerates it)
                r0 = jnp.int32(row0_sm[v])
                cp = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(r0, win_rows)], tab_ss[v], sem)
                cp.start()
                cp.wait()

        zero = jnp.zeros((8, 128), F32)
        zero_i = jnp.zeros((8, 128), I32)
        shape = (8, 128)

        # per-block hoists (vector work once per block per voice)
        amp_nz = [amp[v] != F32(0.0) for v in range(k)]
        if cz and not czm:
            d_row = [cz_dist[v] + dm_row[v] for v in range(k)]
            scales = [K._cz_scales(d_row[v], exact, cz_modes)
                      for v in range(k)]
        if env_a:
            att_dec = [att[v] + dec[v] for v in range(k)]
            cb = cbase_sm[0]

        def lookup(v, idx):
            """tab_s[v] gather at per-lane in-table indices (8,128)."""
            if "lookup" in CYC_ABLATE:
                return idx.astype(F32) * F32(1e-9)
            local = idx + dloc_sm[v]
            grow = jax.lax.shift_right_logical(local, jnp.int32(7))
            col = jax.lax.bitwise_and(local, jnp.int32(127))

            def row(c, acc):
                bc = jnp.broadcast_to(tab_ss[v][pl.ds(c, 1), :], shape)
                g = jax.lax.gather(
                    bc, col[..., None], dnums, slice_sizes=(1, 1),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                return jnp.where(grow == c, g, acc)

            return jax.lax.fori_loop(jnp.min(grow), jnp.max(grow)
                                     + jnp.int32(1), row, zero)

        def read_mod(v, m, delayed, cur, prev):
            """Modulator read with the serial-frame rule: packed order is
            ascending original index, so non-delayed targets are already
            in ``cur``; delayed (>= reader, incl. self) read ``prev``."""
            if "reads" in CYC_ABLATE:
                return zero
            val = zero
            use_prev = delayed != 0
            for j in range(k):
                val = jnp.where(m == jnp.int32(j),
                                jnp.where(use_prev, prev[j], cur[j]), val)
            return val

        def body(t, carry):
            (ph, fin, prev, hc, hv, x1, x2, y1, y2, sg, pnl, pnr,
             vg) = carry
            if noise:
                whiteish = jax.lax.bitcast_convert_type(
                    noise_sm[t], F32)
            cur = list(prev)
            mix_l = zero
            mix_r = zero
            ph_n = list(ph)
            fin_n = list(fin)
            hc_n = list(hc)
            hv_n = list(hv)
            x1_n = list(x1)
            x2_n = list(x2)
            y1_n = list(y1)
            y2_n = list(y2)
            sg_n = list(sg)
            pnl_n = list(pnl)
            pnr_n = list(pnr)
            for v in range(k):
                if "all" in CYC_ABLATE:
                    cur[v] = amp[v]
                    mix_l = mix_l + amp[v]
                    mix_r = mix_r + amp[v]
                    continue
                fin_b = (fin[v] != 0) if finish else False
                active = amp_nz[v] if not finish else (~fin_b & amp_nz[v])
                # ---- oscillator (osc_next synth.c:217-275) ----
                if fm:
                    g = read_mod(v, fm_osc[v], fm_del[v], cur, prev) \
                        * fm_dep[v]
                    inc = jnp.where(use_fm[v] != 0,
                                    fma(mis[v], g, pinc[v]), pinc[v])
                else:
                    inc = pinc[v]
                if dirn:
                    inc = jnp.where(dirneg[v] != 0, -inc, inc)
                phv = ph[v] + inc
                bad = ~jnp.isfinite(phv)
                over = phv >= hi[v]
                under = phv < lo[v]
                r = jnp.fmod(phv - lo[v], Lw[v])
                wrap_over = lo[v] + r
                wrap_under = hi[v] + r
                if finish:
                    osn_b = osn[v] != 0
                    ph2 = jnp.where(
                        over, jnp.where(osn_b, hi[v] - F32(1e-6),
                                        wrap_over),
                        jnp.where(under, jnp.where(osn_b, lo[v],
                                                   wrap_under), phv))
                else:
                    ph2 = jnp.where(over, wrap_over,
                                    jnp.where(under, wrap_under, phv))
                ph2 = jnp.where(bad, F32(0.0), ph2)
                # ---- CZ warp + index + lookup ----
                if cz and "cz" not in CYC_ABLATE:
                    if czm:
                        rdm = read_mod(v, cm_osc[v], cm_del[v], cur, prev)
                        dm = jnp.where(cm_ge[v] != 0, rdm * cm_dep[v],
                                       F32(1.0))
                        d3 = cz_dist[v] + dm
                        sc = None
                    else:
                        d3 = None
                        sc = scales[v]
                    if exact:
                        phase3 = K._kdiv_inv(ph2, inv_ts[v], tsize[v])
                    else:
                        phase3 = ph2 / tsize[v]
                    warped = K._cz_warp_k(cz_mode[v], ph2, d3, tsize[v],
                                          exact, sc, phase3, cz_modes)
                    idx_f = jnp.where(cz_mode[v] != 0, warped, ph2)
                else:
                    idx_f = ph2
                idx = jnp.clip(idx_f.astype(I32), jnp.int32(0), clip_i[v])
                f = lookup(v, idx)
                f = jnp.where(bad, F32(0.0), f)
                if noise:
                    nz_b = is_noise[v] != 0
                    f = jnp.where(nz_b, whiteish, f)
                    adv = active & ~nz_b
                else:
                    adv = active
                ph_n[v] = jnp.where(adv, ph2, ph[v])
                if finish:
                    fin_osc = (bad & (one_shot[v] != 0)) \
                        | ((over | under) & osn_b)
                    fin_n[v] = jnp.where(adv & fin_osc, jnp.int32(1),
                                         fin[v])
                # ---- sample & hold (synth.c:560-571) ----
                if hold and "dsp" not in CYC_ABLATE:
                    h_on = hold_on[v] != 0
                    hv2 = jnp.where(h_on & (hc[v] == 0), f, hv[v])
                    s1 = jnp.where(h_on, hv2, f)
                    hcn = hc[v] + jnp.int32(1)
                    hc_n[v] = jnp.where(
                        active & h_on,
                        jnp.where(hcn >= hmax[v], jnp.int32(0), hcn),
                        hc[v])
                    hv_n[v] = jnp.where(active, hv2, hv[v])
                else:
                    s1 = f
                # ---- bit quantizer (synth.c:341-345) ----
                if quant and "dsp" not in CYC_ABLATE:
                    iv = K._kfma(s1, levels[v], F32(0.5)) \
                        .astype(I32).astype(F32)
                    s2 = jnp.where(quant_on[v] != 0, iv * inv_lev[v], s1)
                else:
                    s2 = s1
                # ---- biquad (mmf_process synth.c:349-364) ----
                if flt and "dsp" not in CYC_ABLATE:
                    fv = b1[v] * x1[v]
                    fv = fma(b0[v], s2, fv)
                    fv = fma(b2[v], x2[v], fv)
                    fv = fma(na1[v], y1[v], fv)
                    fv = fma(na2[v], y2[v], fv)
                    uf = use_flt[v] != 0
                    s3 = jnp.where(uf, fv, s2)
                    upd = active & uf
                    x2_n[v] = jnp.where(upd, x1[v], x2[v])
                    x1_n[v] = jnp.where(upd, s2, x1[v])
                    y2_n[v] = jnp.where(upd, y1[v], y2[v])
                    y1_n[v] = jnp.where(upd, fv, y1[v])
                else:
                    s3 = s2
                # ---- amp / envelope / amp-mod / smoother ----
                if env_a and "dsp" not in CYC_ABLATE:
                    count = cb + t
                    tf = (count - env_start[v]).astype(F32)
                    trf = (count - env_relat[v]).astype(F32)
                    ev = jnp.where(
                        tf < att[v], tf / att[v],
                        jnp.where(
                            tf < att_dec[v],
                            K._kfma(-((tf - att[v]) / dec[v]),
                                    F32(1.0) - sus[v], F32(1.0)),
                            jnp.where(
                                env_relat[v] == 0, sus[v],
                                jnp.where(trf < rel[v],
                                          sus[v] * (F32(1.0)
                                                    - trf / rel[v]),
                                          F32(0.0)))))
                    ev = jnp.where(env_act[v] != 0, ev, F32(0.0))
                    env = jnp.where(use_env[v] != 0, ev * vel[v],
                                    F32(1.0))
                    final = amp[v] * env
                else:
                    final = amp[v]
                if am and "dsp" not in CYC_ABLATE:
                    amr = read_mod(v, am_osc[v], am_del[v], cur, prev)
                    if am_self_f:
                        amr = jnp.where(am_osc[v] == jnp.int32(v), s3,
                                        amr)
                    ampmod = jnp.where(am_osc[v] >= 0, amr * am_dep[v],
                                       F32(1.0))
                    final = final * ampmod
                if sm and "dsp" not in CYC_ABLATE:
                    sg2 = fma(smoothing[v], final - sg[v], sg[v])
                    u_sm = use_sm[v] != 0
                    final2 = jnp.where(u_sm, sg2, final)
                    sg_n[v] = jnp.where(active & u_sm, sg2, sg[v])
                else:
                    final2 = final
                own = s3 * final2
                sample_out = jnp.where(active, own, F32(0.0))
                cur[v] = sample_out
                # ---- pan (+pan-mod) + mix (synth.c:595-612) ----
                dc0 = (disconn[v] == 0) if disc else True
                if pm and "pan" not in CYC_ABLATE:
                    pmr = read_mod(v, pm_osc[v], pm_del[v], cur, prev)
                    if pm_self_f:
                        pmr = jnp.where(pm_self[v] != 0, sample_out, pmr)
                    pan_on = (pm_osc[v] >= 0) & dc0 if disc \
                        else (pm_osc[v] >= 0)
                    one_m_q = fma(-pmr, pm_dep[v], F32(1.0))
                    one_p_q = fma(pmr, pm_dep[v], F32(1.0))
                    plv = jnp.where(pan_on, one_m_q * F32(0.5), pnl[v])
                    prv = jnp.where(pan_on, one_p_q * F32(0.5), pnr[v])
                    pnl_n[v] = jnp.where(active & pan_on, plv, pnl[v])
                    pnr_n[v] = jnp.where(active & pan_on, prv, pnr[v])
                else:
                    plv = pnl[v]
                    prv = pnr[v]
                contrib = active & dc0 if disc else active
                mix_l = mix_l + jnp.where(contrib, sample_out * plv,
                                          F32(0.0))
                mix_r = mix_r + jnp.where(contrib, sample_out * prv,
                                          F32(0.0))
            # ---- master volume smoother (synth.c:616-624) ----
            vg_n = fma(F32(0.002), vf_ref[...] - vg, vg)
            out_l[t] = mix_l * vg_n
            out_r[t] = mix_r * vg_n
            return (tuple(ph_n), tuple(fin_n), tuple(cur), tuple(hc_n),
                    tuple(hv_n), tuple(x1_n), tuple(x2_n), tuple(y1_n),
                    tuple(y2_n), tuple(sg_n), tuple(pnl_n), tuple(pnr_n),
                    vg_n)

        def vload(ref, none_val):
            if ref is None:
                return tuple(none_val for _ in range(k))
            return tuple(ref[v] for v in range(k))

        init = (vload(ph_in, zero), vload(fin_in, zero_i),
                vload(prev_in, zero), vload(hc_in, zero_i),
                vload(hv_in, zero), vload(x1_in, zero), vload(x2_in, zero),
                vload(y1_in, zero), vload(y2_in, zero), vload(sg_in, zero),
                vload(pnl_in, zero), vload(pnr_in, zero), vg_in[...])
        (ph_e, fin_e, prev_e, hc_e, hv_e, x1_e, x2_e, y1_e, y2_e, sg_e,
         pnl_e, pnr_e, vg_e) = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n), body, init)

        def vstore(ref, vals):
            if ref is None:
                return
            for v in range(k):
                ref[v] = vals[v]

        vstore(ph_o, ph_e)
        vstore(prev_o, prev_e)
        vstore(fin_o, fin_e)
        vstore(hc_o, hc_e)
        vstore(hv_o, hv_e)
        vstore(x1_o, x1_e)
        vstore(x2_o, x2_e)
        vstore(y1_o, y1_e)
        vstore(y2_o, y2_e)
        vstore(sg_o, sg_e)
        vstore(pnl_o, pnl_e)
        vstore(pnr_o, pnr_e)
        vg_o[...] = vg_e

    return kernel


@functools.lru_cache(maxsize=None)
def _cyclic_kernel_for(fkey, n, exact, win_rows):
    return _make_cyclic_kernel(fkey, n, exact, win_rows)


def cyclic_block_pallas(table2, row0s, dlocs, cbase, noise_blk, vecs,
                        states, vf, feat, k, n, exact,
                        win_rows=SLOT_ROWS):
    """One block of the cyclic engine over all batch rows.

    table2: [R, 128] flat table buffer; row0s/dlocs: [k] i32 window
    bases; cbase: [1] i32; noise_blk: [n] f32 or None; vecs/states:
    dicts of [k, B] per-voice arrays; vf: [B] volume_final.  Returns
    (out_l [B, n], out_r [B, n], new_states dict)."""
    B = vf.shape[0]
    assert B % ROWS_QUANTUM == 0, f"batch {B} not a ROWS_QUANTUM multiple"
    r = B // 128
    grid = (B // ROWS_QUANTUM,)
    # index maps use i*0, NOT python 0: under x64 a literal 0 traces as
    # an i64 block offset, which Mosaic rejects with an opaque
    # "failed to legalize operation 'func.func'" (probe-bisected on chip)
    vec = pl.BlockSpec((k, 8, 128), lambda i, *_: (i * 0, i, i * 0))
    one = pl.BlockSpec((8, 128), lambda i, *_: (i, i * 0))
    seq = pl.BlockSpec((n, 8, 128), lambda i, *_: (i * 0, i, i * 0))

    wk = lambda a: a.reshape(k, r, 128)
    w1 = lambda a: a.reshape(r, 128)

    ins = [table2]
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]

    def add_k(*arrs):
        for a in arrs:
            ins.append(wk(a))
            in_specs.append(vec)

    fkey = _feat_key(feat, k)
    (fm, cz, czm, am, am_self_f, pm, pm_self_f, env_a, flt, sm, hold,
     quant, noise, finish, dirn, disc, cz_modes, _k) = fkey

    add_k(vecs["amp"], vecs["pinc"], vecs["lo"], vecs["hi"], vecs["L"],
          vecs["clip_i"])
    if fm:
        add_k(vecs["fm_osc"], vecs["fm_del"], vecs["use_fm"], vecs["mis"],
              vecs["fm_dep"])
    if dirn:
        add_k(vecs["dirneg"])
    if cz:
        add_k(vecs["cz_mode"], vecs["cz_dist"], vecs["tsize"],
              vecs["inv_ts"])
        if czm:
            add_k(vecs["cm_osc"], vecs["cm_del"], vecs["cm_ge"],
                  vecs["cm_dep"])
        else:
            add_k(vecs["dm_row"])
    if noise:
        add_k(vecs["is_noise"])
    if finish:
        add_k(vecs["one_shot"], vecs["osn"])
    if hold:
        add_k(vecs["hold_on"], vecs["hmax"])
    if quant:
        add_k(vecs["quant_on"], vecs["levels"], vecs["inv_lev"])
    if flt:
        add_k(vecs["b0"], vecs["b1"], vecs["b2"], vecs["na1"],
              vecs["na2"], vecs["use_flt"])
    if env_a:
        add_k(vecs["use_env"], vecs["env_act"], vecs["env_start"],
              vecs["env_relat"], vecs["att"], vecs["dec"], vecs["sus"],
              vecs["rel"], vecs["vel"])
    if am:
        add_k(vecs["am_osc"], vecs["am_del"], vecs["am_dep"])
    if pm:
        add_k(vecs["pm_osc"], vecs["pm_del"], vecs["pm_dep"])
    if pm_self_f:
        add_k(vecs["pm_self"])
    if disc:
        add_k(vecs["disconn"])
    if sm:
        add_k(vecs["use_sm"], vecs["smoothing"])
    ins.append(w1(vf))
    in_specs.append(one)

    st_names = ["phase", "sample"]
    add_k(states["phase"], states["sample"])
    if finish:
        st_names.append("finished")
        add_k(states["finished"])
    if hold:
        st_names += ["hold_count", "hold_val"]
        add_k(states["hold_count"], states["hold_val"])
    if flt:
        st_names += ["x1", "x2", "y1", "y2"]
        add_k(states["x1"], states["x2"], states["y1"], states["y2"])
    if sm:
        st_names.append("smoother")
        add_k(states["smoother"])
    st_names += ["pan_l", "pan_r"]
    add_k(states["pan_l"], states["pan_r"])
    ins.append(w1(states["vol_gain"]))
    in_specs.append(one)

    sdk = lambda dt: jax.ShapeDtypeStruct((k, r, 128), dt)
    sd1 = lambda dt: jax.ShapeDtypeStruct((r, 128), dt)
    sdn = lambda dt: jax.ShapeDtypeStruct((n, r, 128), dt)
    out_specs = [seq, seq, vec, vec]
    out_shape = [sdn(F32), sdn(F32), sdk(F32), sdk(F32)]
    if finish:
        out_specs.append(vec)
        out_shape.append(sdk(I32))
    if hold:
        out_specs += [vec, vec]
        out_shape += [sdk(I32), sdk(F32)]
    if flt:
        out_specs += [vec] * 4
        out_shape += [sdk(F32)] * 4
    if sm:
        out_specs.append(vec)
        out_shape.append(sdk(F32))
    out_specs += [vec, vec, one]
    out_shape += [sdk(F32), sdk(F32), sd1(F32)]

    prefetch = [row0s, dlocs, cbase]
    if noise:
        prefetch.append(jax.lax.bitcast_convert_type(noise_blk, I32))

    outs = pl.pallas_call(
        _cyclic_kernel_for(fkey, n, bool(exact), int(win_rows)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((win_rows, 128), F32)
                            for _ in range(k)]
            + [pltpu.SemaphoreType.DMA],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=K.INTERPRET,
    )(*prefetch, *ins)

    out_l = outs[0].reshape(n, B).T
    out_r = outs[1].reshape(n, B).T
    i = 2
    new_states = {}
    order = ["phase", "sample"]
    if finish:
        order.append("finished")
    if hold:
        order += ["hold_count", "hold_val"]
    if flt:
        order += ["x1", "x2", "y1", "y2"]
    if sm:
        order.append("smoother")
    order += ["pan_l", "pan_r"]
    for name in order:
        new_states[name] = outs[i].reshape(k, B)
        i += 1
    new_states["vol_gain"] = outs[i].reshape(B)
    return out_l, out_r, new_states


# ---------------------------------------------------------------------------
# block scan + streaming entries (mirrors engine/fused.py's structure)


def _cyclic_scan(carry0, params, ops, seg_of_block, seg_is_start,
                 table_buffer, noise, block0, num_blocks, block, feat,
                 exact, win_rows=SLOT_ROWS):
    B, _, k = params["amp"].shape
    tb_pad = (-table_buffer.shape[0]) % 32768
    if table_buffer.shape[0] + tb_pad < win_rows * 128:
        tb_pad = win_rows * 128 - table_buffer.shape[0]
    if tb_pad:
        table_buffer = jnp.concatenate(
            [table_buffer, jnp.zeros((tb_pad,), table_buffer.dtype)])
    rtot = table_buffer.shape[0] // 128
    tb2 = table_buffer.reshape(rtot, 128)

    p_groups, p_stacked, p_rest = _pack_by_dtype(params, k)
    o_groups, o_stacked, o_rest = _pack_by_dtype(ops, k)

    def _gather(groups, stacked, rest, arrs, seg):
        ar = jnp.arange(B)
        out = {}
        for dt, keys in groups.items():
            blk = stacked[dt][ar, seg]
            for i, kk in enumerate(keys):
                out[kk] = blk[:, i]
        for kk in rest:
            out[kk] = arrs[kk][ar, seg]
        return out

    single_seg = all(v.shape[1] == 1 for v in params.values()) \
        and all(v.shape[1] == 1 for v in ops.values())
    if single_seg:
        p_const = {kk: v[:, 0] for kk, v in params.items()}
        o_const = {kk: v[:, 0] for kk, v in ops.items()}

    def _vecs(p):
        """Per-block derived per-voice vectors, [k, B] layout."""
        T = lambda a: a.T
        tsize_f = p["table_size"].astype(F32)
        use_loop = (p["loop_enabled"] != 0) & (p["loop_valid"] != 0)
        lo = jnp.where(use_loop, p["loop_start_f"], F32(0.0))
        hi = jnp.where(use_loop, p["loop_end_f"], tsize_f)
        v = {
            "amp": T(p["amp"]), "pinc": T(p["phase_inc"]),
            "lo": T(lo), "hi": T(hi), "L": T(hi - lo),
            "clip_i": T(jnp.maximum(p["table_size"] - 1, 0)
                        .astype(I32)),
        }
        if feat.fm:
            fmo = p["freq_mod_osc"]
            mod_inc = jnp.take_along_axis(p["phase_inc"],
                                          jnp.maximum(fmo, 0), axis=1)
            v["fm_osc"] = T(fmo)
            v["fm_del"] = T(p["fm_delayed"])
            v["use_fm"] = T(((fmo >= 0)
                             & (p["fm_self"] == 0)).astype(I32))
            v["mis"] = T(mod_inc * p["freq_scale"])
            v["fm_dep"] = T(p["freq_mod_depth"])
        if feat.direction:
            v["dirneg"] = T(p["direction"])
        if feat.cz:
            v["cz_mode"] = T(p["cz_mode"])
            v["cz_dist"] = T(p["cz_distortion"])
            v["tsize"] = T(tsize_f)
            v["inv_ts"] = T(_div32(F32(1.0), tsize_f))
            if feat.czm:
                cm = p["cz_mod_osc"]
                v["cm_osc"] = T(cm)
                v["cm_del"] = T(p["cm_delayed"])
                v["cm_ge"] = T((cm >= 0).astype(I32))
                v["cm_dep"] = T(p["cz_mod_depth"])
            else:
                v["dm_row"] = T(jnp.where(p["cz_mod_osc"] >= 0, F32(0.0),
                                          F32(1.0)))
        if feat.noise:
            v["is_noise"] = T((p["table_index"]
                               == C.WAVE_TABLE_NOISE_ALT).astype(I32))
        if feat.finish:
            v["one_shot"] = T(p["one_shot"])
            v["osn"] = T(((p["one_shot"] != 0)
                          & (p["loop_enabled"] == 0)).astype(I32))
        if feat.hold:
            v["hold_on"] = T((p["hold_max"] != 0).astype(I32))
            v["hmax"] = T(p["hold_max"])
        if feat.quant:
            levels = (jnp.left_shift(jnp.int32(1), p["quantize"])
                      - 1).astype(F32)
            v["quant_on"] = T((p["quantize"] != 0).astype(I32))
            v["levels"] = T(levels)
            v["inv_lev"] = T(_div32(F32(1.0), jnp.maximum(levels,
                                                          F32(1.0))))
        if feat.flt:
            for kk in ("b0", "b1", "b2", "na1", "na2"):
                v[kk] = T(p[kk])
            v["use_flt"] = T((p["filter_mode"] != 0).astype(I32))
        if feat.env:
            v["use_env"] = T(p["use_amp_envelope"])
            v["env_act"] = T(p["env_active"])
            v["env_start"] = T(p["env_start"])
            v["env_relat"] = T(p["env_rel_at"])
            v["att"] = T(p["env_attack"])
            v["dec"] = T(p["env_decay"])
            v["sus"] = T(p["env_sustain"])
            v["rel"] = T(p["env_release"])
            v["vel"] = T(p["env_velocity"])
        if feat.am:
            v["am_osc"] = T(p["amp_mod_osc"])
            v["am_del"] = T(p["am_delayed"])
            v["am_dep"] = T(p["amp_mod_depth"])
        if feat.pm:
            v["pm_osc"] = T(p["pan_mod_osc"])
            v["pm_del"] = T(p["pm_delayed"])
            v["pm_dep"] = T(p["pan_mod_depth"])
        if feat.pm_self:
            v["pm_self"] = T(p["pm_self"])
        if feat.disc:
            v["disconn"] = T(p["disconnect"])
        if feat.sm:
            v["use_sm"] = T(p["smoother_enable"])
            v["smoothing"] = T(p["smoother_smoothing"])
        # table windows: bindings are row-uniform (cyclic_gate), so the
        # per-voice window base is a [k] scalar vector
        off0 = p["table_off"][0].astype(I32)
        row0 = jnp.clip(off0 // 128, 0, rtot - win_rows)
        return v, row0, off0 - row0 * jnp.int32(128)

    if single_seg:
        vecs_c, row0_c, dloc_c = _vecs(p_const)

    def block_step(carry, kb):
        if single_seg:
            p, o = p_const, o_const
            vecs, row0, dloc = vecs_c, row0_c, dloc_c
        else:
            seg = seg_of_block[:, kb]
            p = _gather(p_groups, p_stacked, p_rest, params, seg)
            o = _gather(o_groups, o_stacked, o_rest, ops, seg)
            vecs, row0, dloc = _vecs(p)
        carry = _apply_ops_b(carry, o, seg_is_start[:, kb][:, None], feat)
        states = {kk: carry[kk].T for kk in
                  ("phase", "sample", "finished", "hold_count", "hold_val",
                   "x1", "x2", "y1", "y2", "smoother", "pan_l", "pan_r")}
        states["vol_gain"] = carry["vol_gain"]
        cbase = ((block0 + kb) * block + 1).astype(I32)[None]
        nblk = jax.lax.dynamic_slice_in_dim(noise, kb * block, block) \
            if feat.noise else None
        out_l, out_r, ns = cyclic_block_pallas(
            tb2, row0, dloc, cbase, nblk, vecs, states,
            p["volume_final"], feat, k, block, exact, win_rows)
        new_carry = dict(carry)
        for kk, vv in ns.items():
            new_carry[kk] = vv.T if vv.ndim == 2 else vv
        out = jnp.stack([out_l, out_r], axis=-1)        # [B, N, 2]
        return new_carry, out

    return jax.lax.scan(block_step, carry0, jnp.arange(num_blocks))


@functools.partial(jax.jit, static_argnames=("num_blocks", "block",
                                             "exact", "feat", "win_rows"),
                   donate_argnums=(0,))
def _cyclic_chunk_jit(carry, params, ops, seg_of_block, seg_is_start,
                      table_buffer, noise, block0, num_blocks, block,
                      exact=True, feat=Feat(), win_rows=SLOT_ROWS):
    """One streaming chunk of the cyclic engine (same contract as
    fused._fused_chunk_jit: full-render seg/noise arrays sliced on
    device at the traced offset; carry donated)."""
    if seg_of_block.shape[1] > num_blocks:
        seg_of_block = jax.lax.dynamic_slice_in_dim(
            seg_of_block, block0, num_blocks, axis=1)
        seg_is_start = jax.lax.dynamic_slice_in_dim(
            seg_is_start, block0, num_blocks, axis=1)
    if noise.ndim == 1 and noise.shape[0] > num_blocks * block:
        noise = jax.lax.dynamic_slice_in_dim(
            noise, block0 * block, num_blocks * block, axis=0)
    return _cyclic_scan(carry, params, ops, seg_of_block, seg_is_start,
                        table_buffer, noise, block0, num_blocks, block,
                        feat, exact, win_rows)


def _prep(st):
    from skred_tpu.parallel.batch import _prep_params, pack_stacked

    if "fm_delayed" not in st.params:
        st = pack_stacked(st, cyclic=True)
    reason = cyclic_gate(st)
    if reason is not None:
        raise ValueError(f"cyclic kernel ineligible: {reason}")
    params = {kk: jnp.asarray(v) for kk, v in _prep_params(st).items()}
    ops = {kk: jnp.asarray(v) for kk, v in st.ops.items()}
    return st, params, ops


def render_cyclic_stream(st, chunk_blocks: int = 172, noise=None,
                         exact: bool = True, keep_rows: Optional[int] = None):
    """Generator yielding rendered chunks [rows, chunk*block, 2]."""
    st, params, ops = _prep(st)
    feat = compute_feat(st)
    win_rows = win_rows_for(st)
    B = st.batch
    k = params["amp"].shape[-1]
    carry = make_carry0(B, k)
    sob = jnp.asarray(np.asarray(st.seg_of_block))
    sis = jnp.asarray(np.asarray(st.seg_is_start))
    if feat.noise:
        n_full = jnp.asarray(
            noise_stream(st.num_blocks * st.block) if noise is None
            else noise[:st.num_blocks * st.block])
    else:
        n_full = jnp.zeros((1,), F32)
    table = jnp.asarray(st.table_buffer)
    for b0 in range(0, st.num_blocks, chunk_blocks):
        nb = min(chunk_blocks, st.num_blocks - b0)
        carry, outs = _cyclic_chunk_jit(
            carry, params, ops, sob, sis, table, n_full, jnp.int32(b0),
            num_blocks=nb, block=st.block, exact=exact, feat=feat,
            win_rows=win_rows)
        r = B if keep_rows is None else min(keep_rows, B)
        yield np.asarray(outs[:, :r]).swapaxes(0, 1) \
            .reshape(r, nb * st.block, 2)


def render_cyclic(st, noise=None, exact: bool = True) -> np.ndarray:
    """Full render → [B, T, 2] (tests / small batches)."""
    chunks = list(render_cyclic_stream(st, chunk_blocks=st.num_blocks,
                                       noise=noise, exact=exact))
    return np.concatenate(chunks, axis=1)


def render_cyclic_stream_device(st, chunk_blocks: int = 172,
                                exact: bool = True,
                                warmup_only: bool = False) -> float:
    """Streamed render keeping everything on device; returns the final
    chunk's |out| sum (bench entry, same contract as
    fused.render_fused_stream_device)."""
    st, params, ops = _prep(st)
    feat = compute_feat(st)
    win_rows = win_rows_for(st)
    B = st.batch
    k = params["amp"].shape[-1]
    carry = make_carry0(B, k)
    outs = None
    whole = (st.num_blocks // chunk_blocks) * chunk_blocks
    sob = jnp.asarray(np.asarray(st.seg_of_block))
    sis = jnp.asarray(np.asarray(st.seg_is_start))
    n_full = jnp.asarray(noise_stream(whole * st.block)) if feat.noise \
        else jnp.zeros((1,), F32)
    table = jnp.asarray(st.table_buffer)
    for b0 in range(0, whole, chunk_blocks):
        carry, outs = _cyclic_chunk_jit(
            carry, params, ops, sob, sis, table, n_full, jnp.int32(b0),
            num_blocks=chunk_blocks, block=st.block, exact=exact,
            feat=feat, win_rows=win_rows)
        if warmup_only:
            break
    if outs is None:
        return 0.0
    return float(jnp.sum(jnp.abs(outs[-1])))
