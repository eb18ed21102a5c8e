"""Fused block-parallel renderer — the fast TPU engine.

The compat engine (render.py) replicates the reference's per-sample loop
under ``lax.scan`` — bit-exact but sequential: TPUs hate 44100 tiny steps
per audio-second.  This engine removes the per-sample loop entirely by
exploiting the structure of the DSP graph:

  * oscillator phase is an *integral* — ``cumsum`` of per-sample
    increments (f64 in-block for precision), loop-wrap applied
    analytically, one-shot finish via ``cummax`` masking;
  * the biquad filter and the amp/volume smoothers are *linear
    recurrences* — ``jax.lax.associative_scan`` over affine maps
    (O(log N) depth instead of O(N));
  * envelopes are closed-form functions of the sample counter;
  * sample&hold positions are arithmetic on the hold counter;
  * the voice modulation graph is resolved by *block-level fixed-point*:
    pass p computes every voice's full block using pass p−1's modulator
    blocks; ``depth`` passes give the exact dataflow (modulator reads are
    a one-hot matmul over the voice axis plus a one-sample shift for
    higher-indexed modulators — reference semantics, synth.c:548-602).

Numerics: not bit-identical to the C engine (summation orders differ) but
validated ≤ −60 dB against the same goldens on the corpus (see
tools/parity_sweep.py --fused).  The compat engine remains the reference
implementation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax

jax.config.update("jax_enable_x64", True)   # f64 in-block phase integrals

import jax.numpy as jnp
import numpy as np

from skred_tpu import config as C
from skred_tpu.engine.render import _div32, _fma32
from skred_tpu.host.timeline import Timeline, noise_stream

V = C.VOICE_MAX
F32 = jnp.float32
F64 = jnp.float64
I32 = jnp.int32

VOICE_IDX = np.arange(V, dtype=np.int32)


def _fma(a, b, c, exact):
    """gcc-contracted multiply-add sites (see render._fma32): exact mode
    reproduces the reference binary's single-rounding fma on any backend;
    fast mode is plain separately-rounded mul+add."""
    return _fma32(a, b, c) if exact else a * b + c


class Feat(NamedTuple):
    """Static per-batch DSP feature flags: which stages exist ANYWHERE in
    the stacked timelines.  Stages that are off for the whole batch are
    compiled out of the block pass and the serial Pallas kernels — the
    offline analog of the reference's per-voice runtime skips
    (synth.c:531-542), resolved at trace time instead."""

    fm: bool = True          # any freq_mod_osc >= 0
    cz: bool = True          # any cz_mode != 0 (phase-distortion warp)
    czm: bool = True         # any EFFECTIVE cz-mod edge: cz_mod_osc >= 0
                             # on a warped voice with nonzero depth.
                             # cz_mod_osc defaults to 0 (never reset,
                             # host/timeline.py:143), so the reference's
                             # read happens on every warped voice — but a
                             # zero-depth read multiplies to exactly 0.0,
                             # data-independent, so no modulator read is
                             # needed (dm = cm>=0 ? 0.0 : 1.0).
    am: bool = True          # any amp_mod_osc >= 0
    pm: bool = True          # any pan_mod_osc >= 0
    am_self: bool = True     # any packed am_self flag
    pm_self: bool = True
    env: bool = True         # any use_amp_envelope
    flt: bool = True         # any filter_mode != 0
    sm: bool = True          # any smoother_enable
    hold: bool = True        # any hold_max != 0
    quant: bool = True       # any quantize != 0
    noise: bool = True       # any noise-alt voice
    finish: bool = True      # any one-shot voice (finished can flip)
    direction: bool = True   # any reversed oscillator
    disc: bool = True        # any disconnected voice
    hold_copy: bool = True   # any copy_hold_from op
    cz_modes: tuple = (1, 2, 3, 4, 5, 6, 7)
    #                        # the cz_mode values present ANYWHERE in the
    #                        # batch (any segment/lane): the warp computes
    #                        # only these curves.  The corpus is almost
    #                        # entirely mode 1 — the full 7-mode warp
    #                        # (incl. two fast_pows and an fmod per
    #                        # sample) owned 40% of the heavy bucket's
    #                        # block wall (mega_ablate, round 3).
    pm_lanes: tuple = ()     # packed lanes with pan_mod_osc >= 0 in ANY
    #                        # segment/row — the only lanes whose pan can
    #                        # vary per sample.  Static so the pan+mix
    #                        # stage runs on a compact [B, P, N] slab
    #                        # (P = |pm_lanes|) instead of the full
    #                        # [B, Vp, N] materialization.
    pm_srcs: tuple = ()      # packed lanes any pan-mod edge READS
    ts_pow2: bool = False    # every table_size in ANY segment/lane a
    #                        # power of two (w0-w6 4096, Korg 2048 —
    #                        # i.e. everything but PCM/WAV slots): phase
    #                        # normalization ph/tsize is then an EXACT
    #                        # multiply by the hoisted reciprocal, so
    #                        # the megakernel skips the per-sample
    #                        # Markstein correction (2 software fmas)


def compute_feat(st, lanes=None) -> Feat:
    """Derive the static feature flags from a (packed) StackedTimelines.

    ``lanes=(lo, hi)`` restricts to a voice-lane slice — used to derive
    per-tier flags so each tier's pass/kernels compile out stages only
    *other* tiers use (a tier of plain LFO modulators carries no biquad
    chain even when the batch's carrier tier filters)."""
    p, o = st.params, st.ops
    sl = slice(*lanes) if lanes is not None else slice(None)
    arr = lambda k: np.asarray(p[k])[..., sl]
    oarr = lambda k: np.asarray(o[k])[..., sl]
    return Feat(
        fm=bool((arr("freq_mod_osc") >= 0).any()),
        cz=bool((arr("cz_mode") != 0).any()),
        czm=bool(((arr("cz_mod_osc") >= 0)
                  & (arr("cz_mode") != 0)
                  & (arr("cz_mod_depth") != 0)).any()),
        am=bool((arr("amp_mod_osc") >= 0).any()),
        pm=bool((arr("pan_mod_osc") >= 0).any()),
        am_self=bool("am_self" in p and (arr("am_self") != 0).any()),
        pm_self=bool("pm_self" in p and (arr("pm_self") != 0).any()),
        env=bool((arr("use_amp_envelope") != 0).any()),
        flt=bool((arr("filter_mode") != 0).any()),
        sm=bool((arr("smoother_enable") != 0).any()),
        hold=bool((arr("hold_max") != 0).any()),
        quant=bool((arr("quantize") != 0).any()),
        noise=bool((arr("table_index") == C.WAVE_TABLE_NOISE_ALT).any()),
        finish=bool((arr("one_shot") != 0).any()
                    or (oarr("set_finished")
                        & (oarr("finished") != 0)).any()),
        direction=bool((arr("direction") != 0).any()),
        disc=bool((arr("disconnect") != 0).any()),
        hold_copy=bool((oarr("copy_hold_from") >= 0).any()),
        cz_modes=tuple(int(v) for v in np.unique(arr("cz_mode"))
                       if 1 <= v <= 7),
        # lane indices stay GLOBAL packed coordinates (what _mix_parts
        # consumes), but the sets honor the lanes=(lo, hi) slice like
        # every other field: a per-tier Feat lists only its own tier's
        # pan-modulated lanes / the sources its tier's edges read
        pm_lanes=tuple(int(v) + (lanes[0] if lanes is not None else 0)
                       for v in np.nonzero(
                           (arr("pan_mod_osc") >= 0).any(axis=(0, 1)))[0]),
        pm_srcs=tuple(int(v) for v in np.unique(arr("pan_mod_osc"))
                      if v >= 0),
        # ts=0 lanes pass too: inf·ph and the _kdiv_inv fallback ph/0
        # agree (inf for ph>0, nan for ph==0), and only cz lanes (which
        # always carry a real table) consume the normalized phase
        ts_pow2=bool((np.bitwise_and(arr("table_size"),
                                     arr("table_size") - 1) == 0).all()),
    )


def _affine_scan(a, b, x0, axis=-1):
    """First-order linear recurrence  x_t = a_t * x_{t-1} + b_t  with
    initial value x0, via associative_scan.  a broadcasts over time."""
    a = jnp.broadcast_to(a, b.shape)
    # fold x0 into the first step
    b0 = b[..., 0] + a[..., 0] * x0
    b = jnp.concatenate([b0[..., None], b[..., 1:]], axis=-1)

    def combine(l, r):
        la, lb = l
        ra, rb = r
        return la * ra, lb * ra + rb

    _, x = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return x


def _biquad_block(x, b0, b1, b2, na1, na2, x1, x2, y1, y2):
    """Biquad over a block via associative scan on the order-2 recurrence
    y_t = (b0 x_t + b1 x_{t-1} + b2 x_{t-2}) + na1 y_{t-1} + na2 y_{t-2}.

    x: [..., N]; coefficients/state: [...].  Returns (y, new states)."""
    xm1 = jnp.concatenate([x1[..., None], x[..., :-1]], axis=-1)
    xm2 = jnp.concatenate([x2[..., None], x1[..., None], x[..., :-2]], axis=-1)
    f = (b0[..., None] * x + b1[..., None] * xm1 + b2[..., None] * xm2)
    # state s_t = [y_t, y_{t-1}];  s_t = M s_{t-1} + [f_t, 0]
    # associative elements: (M_t, u_t) with combine (M2 M1, M2 u1 + u2).
    N = x.shape[-1]
    sh = x.shape
    A = jnp.broadcast_to(na1[..., None], sh)
    B = jnp.broadcast_to(na2[..., None], sh)
    one = jnp.ones_like(A)
    zero = jnp.zeros_like(A)
    # M = [[a, b], [1, 0]] per step (same every step)
    m00, m01, m10, m11 = A, B, one, zero
    u0, u1 = f, zero

    # fold initial state into first element: s_1 = M s_0 + u_1
    s0_0 = y1
    s0_1 = y2
    u0 = u0.at[..., 0].add(m00[..., 0] * s0_0 + m01[..., 0] * s0_1)
    u1 = u1.at[..., 0].add(m10[..., 0] * s0_0 + m11[..., 0] * s0_1)
    m00 = m00.at[..., 0].set(0.0)
    m01 = m01.at[..., 0].set(0.0)
    m10 = m10.at[..., 0].set(0.0)
    m11 = m11.at[..., 0].set(0.0)

    def combine(l, r):
        l00, l01, l10, l11, lu0, lu1 = l
        r00, r01, r10, r11, ru0, ru1 = r
        # compose r ∘ l : M = R L ; u = R lu + ru
        c00 = r00 * l00 + r01 * l10
        c01 = r00 * l01 + r01 * l11
        c10 = r10 * l00 + r11 * l10
        c11 = r10 * l01 + r11 * l11
        cu0 = r00 * lu0 + r01 * lu1 + ru0
        cu1 = r10 * lu0 + r11 * lu1 + ru1
        return c00, c01, c10, c11, cu0, cu1

    res = jax.lax.associative_scan(
        combine, (m00, m01, m10, m11, u0, u1), axis=-1)
    y = res[4]
    new_y1 = y[..., -1]
    new_y2 = jnp.where(N >= 2, y[..., -2], y1)
    new_x1 = x[..., -1]
    new_x2 = jnp.where(N >= 2, x[..., -2], x1)
    return y, new_x1, new_x2, new_y1, new_y2


def _envelope_block(counts, p):
    """Closed-form ADSR over a block (synth.c:398-431). counts: [N]."""
    t = (counts[None, None, :] - p["env_start"][..., None]).astype(F32)
    att = p["env_attack"][..., None]
    dec = p["env_decay"][..., None]
    sus = p["env_sustain"][..., None]
    rel = p["env_release"][..., None]
    tr = (counts[None, None, :] - p["env_rel_at"][..., None]).astype(F32)
    v = jnp.where(
        t < att, _div32(t, att),
        jnp.where(t < att + dec,
                  _fma32(-_div32(t - att, dec), F32(1.0) - sus, F32(1.0)),
                  jnp.where(p["env_rel_at"][..., None] == 0, sus,
                            jnp.where(tr < rel,
                                      sus * (F32(1.0) - _div32(tr, rel)),
                                      F32(0.0)))))
    return jnp.where(p["env_active"][..., None] != 0, v, F32(0.0))


def _fast_pow(a, b):
    i = jax.lax.bitcast_convert_type(a, I32)
    x = _fma32(b, (i - 1065353216).astype(F32), F32(1065353216))
    r = jax.lax.bitcast_convert_type(x.astype(I32), F32)
    return jnp.where(a <= 0.0, F32(0.0), r)


def _cz_phasor(mode, ph, d, tsize, modes=(1, 2, 3, 4, 5, 6, 7)):
    """CZ phase-distortion warp (reference cz_phasor synth.c:149-215).
    ``modes`` statically restricts to the curve set present in the batch
    — only those branches are computed (elementwise numerics identical
    for the selected lanes)."""
    phase = _div32(ph, tsize)
    d = jnp.clip(d, 0.0, 0.999)
    half, one = F32(0.5), F32(1.0)
    mk = {}
    if 1 in modes:
        mk[1] = jnp.where(phase < d, phase * _div32(half, d),
                          _fma32(phase - d, _div32(half, one - d), half))
    if 2 in modes or 3 in modes or 5 in modes:
        sc2 = _div32(half, half - d * half)
    if 2 in modes:
        mk[2] = jnp.where(phase < half, phase * sc2,
                          _fma32(-(one - phase), sc2, one))
    if 3 in modes:
        mk[3] = jnp.where(phase < half, phase * sc2,
                          _fma32(phase - half, sc2, half))
    if 4 in modes:
        mk[4] = jnp.fmod(phase * F32(2.0), one)
    if 5 in modes:
        sc5b = _div32(half, half + d * half)
        mk[5] = jnp.where(phase < half, phase * sc2,
                          _fma32(phase - half, sc5b, half))
    if 6 in modes:
        mk[6] = _fast_pow(phase, one + F32(4.0) * d)
    if 7 in modes:
        mk[7] = _fast_pow(phase, one + F32(8.0) * d)
    # first-match where chain, NOT jnp.select (x64 makes select's argmax
    # index i64; modes are mutually exclusive so the order is free)
    out = phase
    for k in sorted(mk, reverse=True):
        out = jnp.where(mode == k, mk[k], out)
    return out * tsize


def _read_block(est, prev_last, osc, delayed):
    """Modulator read over a block with reference serial-order semantics
    (synth.c:526): a read of a modulator with *original* index >= the
    reader's sees a one-sample delay (``delayed`` flag, computed at pack
    time from pre-packing indices).

    Implemented as a one-hot matmul over the voice axis — XLA's native
    gather costs ~13 ns/element on TPU, the MXU does this for free.

    est: [B, V, N] candidate blocks; prev_last: [B, V] previous block's
    final samples; osc/delayed: [B, V]."""
    return _read_blocks_multi(est, prev_last, [(osc, delayed)])[0]


def _read_blocks_multi(est, prev_last, pairs):
    """All of a pass's modulator reads in ONE one-hot matmul: ``pairs`` is
    a list of (osc [B, V], delayed [B, V]); the selectors stack on a new
    axis so the K reads ride a single [B, K·V, V_src] × [B, V_src, N]
    MXU contraction instead of K small ones (per-element numerics
    identical: the same dot over the source axis).  Returns K arrays
    [B, V, N] in order."""
    nv = est.shape[1]
    k = len(pairs)
    osc = jnp.stack([o for o, _ in pairs], axis=1)        # [B, K, V]
    sel = (osc[..., None] == np.arange(nv, dtype=np.int32)).astype(est.dtype)
    src = jnp.einsum("bknm,bmt->bknt", sel, est,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    src_last = jnp.einsum("bknm,bm->bkn", sel, prev_last,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    shifted = jnp.concatenate([src_last[..., None], src[..., :-1]], axis=-1)
    delayed = jnp.stack([d for _, d in pairs], axis=1)    # [B, K, V]
    out = jnp.where((delayed != 0)[..., None], shifted, src)
    return [out[:, i] for i in range(k)]


def _voice_block_pass(est, carry, p, noise_blk, counts, table_buffer,
                      exact=False, use_pallas=False, feat=Feat(), N=None,
                      full=None, rk="", mega=False, mixw=None,
                      fold_bank=None):
    """One block-level pass: compute a set of voices' full blocks.

    est: [B, V_src, N] modulator sample estimates (may be None when no
    modulation feature is on); carry/p: state/params for the voices being
    computed (a tier's lane slice under tiered evaluation).  ``full``
    carries source-indexed arrays spanning ALL lanes ({"sample",
    "phase_inc"}) when est is wider than this pass's slice; ``rk`` is the
    roster-key suffix selecting this slice's table-lookup rosters.
    ``feat`` statically prunes stages absent from the whole batch.
    Returns (samples [B,V,N], left, right, new_carry)."""
    if est is not None:
        N = est.shape[-1]
    B, V_ = p["amp"].shape
    active0 = p["amp"] != 0.0                       # [B, V]
    prev_last = full["sample"] if full is not None else carry["sample"]

    # ---- all modulator reads in one one-hot matmul ----
    # ``est`` may span only the earlier tiers (block_step's rendered-so-
    # far slab) or be None for the first tier: selectors past its width
    # read 0.0 — correct, because sample-feeding edges always target an
    # earlier tier and anything else multiplies by a zero depth.
    read_specs = []
    if feat.fm:
        read_specs.append(("fm", p["freq_mod_osc"], p["fm_delayed"]))
    if feat.cz and feat.czm:
        read_specs.append(("cz", p["cz_mod_osc"], p["cm_delayed"]))
    if feat.am:
        read_specs.append(("am", p["amp_mod_osc"], p["am_delayed"]))
    if read_specs:
        if est is None:
            z = jnp.zeros((B, V_, N), F32)
            reads = {name: z for name, _, _ in read_specs}
        else:
            reads = dict(zip(
                (name for name, _, _ in read_specs),
                _read_blocks_multi(est, prev_last[:, :est.shape[1]],
                                   [(o, d) for _, o, d in read_specs])))

    # ---- FM increments ----
    if feat.fm:
        fm = p["freq_mod_osc"]
        fm_read = reads["fm"]
        g = fm_read * p["freq_mod_depth"][..., None]
        src_inc = full["phase_inc"] if full is not None else p["phase_inc"]
        mod_inc = jnp.take_along_axis(src_inc, jnp.maximum(fm, 0), axis=1)
        use_fm = (fm >= 0) & (p["fm_self"] == 0)
        inc = jnp.where(use_fm[..., None],
                        _fma((mod_inc * p["freq_scale"])[..., None], g,
                             p["phase_inc"][..., None], exact),
                        jnp.broadcast_to(p["phase_inc"][..., None], g.shape))
        if feat.direction:
            inc = jnp.where(p["direction"][..., None] != 0, -inc, inc)
        inc_row = None
    else:
        # no FM anywhere: the increment is constant within the block
        inc_row = p["phase_inc"]
        if feat.direction:
            inc_row = jnp.where(p["direction"] != 0, -inc_row, inc_row)
        inc = None

    # ---- phase walk ----
    # The phase recurrence is replicated with the reference's exact serial
    # f32 adds + per-sample wrap (osc_next, synth.c:217-258) in a *minimal*
    # scan carrying only (phase, finished): anything else (an f64 cumsum,
    # say) random-walks away from the C engine's per-sample rounding and
    # decorrelates deep-FM voices within seconds.
    tsize_f = p["table_size"].astype(F32)
    use_loop = (p["loop_enabled"] != 0) & (p["loop_valid"] != 0)
    lo = jnp.where(use_loop, p["loop_start_f"], F32(0.0))
    hi = jnp.where(use_loop, p["loop_end_f"], tsize_f)
    L = hi - lo
    os_noloop = (p["one_shot"] != 0) & (p["loop_enabled"] == 0)
    fin_prev = carry["finished"] != 0
    if feat.noise:
        is_noise_v = p["table_index"] == C.WAVE_TABLE_NOISE_ALT
        adv_v = active0 & ~fin_prev & ~is_noise_v
    else:
        adv_v = active0 & ~fin_prev

    if use_pallas and mega and not feat.noise:
        return _mega_pass(carry, p, counts, table_buffer, exact, feat, N,
                          B, V_, inc_row,
                          reads if read_specs else {}, active0, fin_prev,
                          adv_v, lo, hi, L, os_noloop, tsize_f,
                          use_fm=use_fm if feat.fm else None,
                          mis=(mod_inc * p["freq_scale"]) if feat.fm
                          else None, mixw=mixw, fold_bank=fold_bank)

    B_ = B
    if use_pallas:
        from skred_tpu.engine import kernels as K

        flat = lambda a: a.reshape(B_ * V_)
        ph_T, dead_T, ph_end_f, fin_end_f = K.phase_walk_pallas(
            K.to_time_major(inc) if feat.fm else flat(inc_row),
            flat(carry["phase"]), flat(carry["finished"]),
            flat(lo), flat(hi), flat(L), flat(os_noloop.astype(jnp.int32)),
            flat(p["one_shot"]), flat(adv_v.astype(jnp.int32)),
            flat(active0.astype(jnp.int32)),
            fm=feat.fm, finish=feat.finish, n=N)
        ph32 = K.from_time_major(ph_T, B_, V_)
        ph_end = ph_end_f.reshape(B_, V_)
        if feat.finish:
            dead = K.from_time_major(dead_T, B_, V_) != 0
            fin_end = fin_end_f.reshape(B_, V_) != 0
        else:
            dead = None
            fin_end = fin_prev
    else:
        if not feat.fm:
            inc = jnp.broadcast_to(inc_row[..., None], (B_, V_, N))

        def ph_step(c, inc_t):
            ph_c, fin_c = c
            ph = ph_c + inc_t
            bad = ~jnp.isfinite(ph)
            over = ph >= hi
            under = ph < lo
            # single fmod for both wrap directions (see kernels._make_
            # phase_kernel): fmodf(lo-ph, L) == -fmodf(ph-lo, L) exactly
            r = jnp.fmod(ph - lo, L)
            wrap_over = lo + r
            wrap_under = hi + r
            ph2 = jnp.where(over,
                            jnp.where(os_noloop, hi - F32(1e-6), wrap_over),
                            jnp.where(under,
                                      jnp.where(os_noloop, lo, wrap_under),
                                      ph))
            ph2 = jnp.where(bad, F32(0.0), ph2)
            fin_new = ((bad & (p["one_shot"] != 0))
                       | ((over | under) & os_noloop))
            step_on = adv_v & ~fin_c
            dead_t = fin_c | ~active0
            ph_keep = jnp.where(step_on, ph2, ph_c)
            fin_keep = jnp.where(step_on & fin_new, True, fin_c)
            return (ph_keep, fin_keep), (ph2, dead_t)

        (ph_end, fin_end), (ph_seq, dead_seq) = jax.lax.scan(
            ph_step, (carry["phase"], fin_prev), jnp.moveaxis(inc, -1, 0))
        ph32 = jnp.moveaxis(ph_seq, 0, -1)       # [B, V, N]
        if feat.finish:
            dead = jnp.moveaxis(dead_seq, 0, -1)  # entering-dead per sample
        else:
            dead = None
            fin_end = fin_prev

    # ---- table lookup (+ CZ) ----
    if feat.cz:
        if feat.czm:
            cm = p["cz_mod_osc"]
            cz_read = reads["cz"]
            dm = jnp.where((cm >= 0)[..., None],
                           cz_read * p["cz_mod_depth"][..., None], F32(1.0))
        else:
            # no effective CZ-mod edge anywhere (every warped voice's
            # depth is 0): the reference still branches on cm >= 0
            # (synth.c:263-264), but the taken read multiplies to
            # exactly +0.0 — data-independent, so no modulator read
            dm = jnp.where((p["cz_mod_osc"] >= 0)[..., None],
                           F32(0.0), F32(1.0))
        cz_idx = _cz_phasor(p["cz_mode"][..., None], ph32,
                            p["cz_distortion"][..., None] + dm,
                            tsize_f[..., None], modes=feat.cz_modes)
        idx_f = jnp.where((p["cz_mode"] != 0)[..., None], cz_idx, ph32)
    else:
        idx_f = ph32
    idx = jnp.clip(idx_f.astype(I32), 0,
                   jnp.maximum(p["table_size"] - 1, 0)[..., None])
    use_lut = (use_pallas and "small_voice" in p
               and table_buffer.shape[0] % 4096 == 0 and N % 128 == 0)
    if use_lut:
        # Tiered table reads out of VMEM (kernels.table_lookup_pallas)
        # instead of XLA's HBM gather — the original TPU throughput
        # ceiling.  Small tier: every voice, one 4096 slot.  Medium tier
        # (tables <= 32768, i.e. most sampled PCM): a dense one-hot roster
        # into the 32768-slot kernel.  Only voices binding even larger PCM
        # keep the XLA gather via their own roster.
        from skred_tpu.engine import kernels as KK

        def roster_select(name):
            bm = p[name]                              # [B, G], sentinel >= V
            sel = jax.nn.one_hot(bm, V_, dtype=F32)   # zero row for sentinel
            idx_g = jnp.einsum("bgv,bvn->bgn", sel, idx.astype(F32),
                               preferred_element_type=F32,
                               precision=jax.lax.Precision.HIGHEST).astype(I32)
            off_g = jnp.take_along_axis(
                p["table_off"], jnp.minimum(bm, V_ - 1).astype(I32), axis=1)
            off_g = jnp.where(bm < V_, off_g, 0)
            return sel, idx_g, off_g

        def roster_scatter(sel, f_g):
            return jnp.einsum("bgv,bgn->bvn", sel, f_g,
                              preferred_element_type=F32,
                              precision=jax.lax.Precision.HIGHEST)

        # voice-major lane order: the kernel's grid walks all rows of one
        # voice before the next, so lanes binding the same table sit on
        # CONSECUTIVE grid steps and the Pallas pipeline skips the slot
        # re-DMA (equal block indices are not re-fetched) — on replicated
        # or same-patch batches this cuts the dominant HBM stream (a
        # 16 KB table copy per lane per block) by the run length
        tb3 = table_buffer.reshape(-1, 32, 128)
        slot = (p["table_off"] // 4096).astype(I32)
        has_rosters = ("med_map" + rk) in p or ("big_map" + rk) in p
        if has_rosters:
            # medium/big-table lanes resolve through their rosters below;
            # zero their indices so the small-tier sweep for those lanes
            # collapses to one row (the kernel's dynamic row bounds)
            idx_s = jnp.where((p["small_voice"] != 0)[..., None], idx, 0)
        else:
            idx_s = idx
        f_osc = KK.table_lookup_grouped(
            tb3, slot.T.reshape(V_ * B_),
            idx_s.transpose(1, 0, 2).reshape(V_ * B_, N)) \
            .reshape(V_, B_, N).transpose(1, 0, 2)
        if ("med_map" + rk) in p and table_buffer.shape[0] % 32768 == 0:
            sel, idx_m, off_m = roster_select("med_map" + rk)
            gm = idx_m.shape[1]
            f_m = KK.table_lookup_grouped(
                table_buffer.reshape(-1, 256, 128),
                (off_m // 32768).astype(I32).T.reshape(gm * B_),
                idx_m.transpose(1, 0, 2).reshape(gm * B_, N),
                slot_size=32768).reshape(gm, B_, N).transpose(1, 0, 2)
            f_osc = jnp.where(p["med_voice"][..., None] != 0,
                              roster_scatter(sel, f_m), f_osc)
        if ("big_map" + rk) in p:
            sel, idx_g, off_g = roster_select("big_map" + rk)
            f_big = table_buffer[off_g[..., None] + idx_g]
            big_v = (p["small_voice"] == 0) & (p.get("med_voice", 0) == 0)
            f_osc = jnp.where(big_v[..., None], roster_scatter(sel, f_big),
                              f_osc)
    else:
        f_osc = table_buffer[p["table_off"][..., None] + idx]

    if feat.noise:
        is_noise = is_noise_v[..., None]
        f = jnp.where(is_noise, noise_blk[None, None, :], f_osc)
    else:
        f = f_osc
    N_ = f.shape[-1]
    if feat.finish:
        alive = ~dead
        f = jnp.where(alive, f, F32(0.0))
    else:
        # no one-shot voices: alive is constant within the block
        alive = None
        f = jnp.where(active0[..., None], f, F32(0.0))

    new_phase = ph_end
    new_finished = fin_end.astype(I32)

    if feat.finish:
        # alive prefix length per voice (dead is monotone within a block):
        # states freeze at the last alive sample, like the reference's skip
        cnt = alive.sum(axis=-1).astype(I32)     # [B, V]
        il = jnp.clip(cnt - 1, 0, N_ - 1)
        any_alive = cnt >= 1

        # one-hot reductions instead of per-element gathers (slow on TPU)
        tpos_f = np.arange(N_, dtype=np.int32)
        oh_last = (il[..., None] == tpos_f).astype(F32)

        def at_last(seq):
            return (seq * oh_last).sum(axis=-1)
    else:
        cnt = jnp.where(active0, N_, 0).astype(I32)
        any_alive = active0

        def at_last(seq):
            return seq[..., -1]

    # ---- shared per-voice controls ----
    hold_on = (p["hold_max"] != 0)
    hm = jnp.maximum(p["hold_max"], 1)
    if feat.quant:
        levels = (jnp.left_shift(jnp.int32(1), p["quantize"]) - 1).astype(F32)
        inv_levels = _div32(F32(1.0), jnp.maximum(levels, F32(1.0)))
    if feat.env:
        env = jnp.where(
            (p["use_amp_envelope"] != 0)[..., None],
            _envelope_block(counts, p) * p["env_velocity"][..., None],
            F32(1.0))
    if feat.am:
        am = p["amp_mod_osc"]
        am_read = reads["am"]
        ampmod_x = jnp.where((am >= 0)[..., None],
                             am_read * p["amp_mod_depth"][..., None],
                             F32(1.0))
    # amp-mod self-read sees the voice's own post-filter sample —
    # resolved inside the serial pass below
    am_self = p["am_self"] != 0
    use_flt = (p["filter_mode"] != 0)
    use_sm = (p["smoother_enable"] != 0)
    amp_ = p["amp"]
    smoothing = p["smoother_smoothing"]

    if use_pallas:
        # sample&hold + quantizer + filter + smoother fused into one
        # serial Pallas pass — the XLA associative-scan forward fill and
        # its per-block materializations disappear
        from skred_tpu.engine import kernels as K

        flat = lambda a: a.reshape(B_ * V_)
        kfeat = (feat.flt, feat.sm, feat.hold, feat.quant, feat.am_self,
                 feat.env, feat.am, feat.finish)
        outs = K.filt_smooth_pallas(
            K.to_time_major(f),
            K.to_time_major(env) if feat.env else None,
            K.to_time_major(ampmod_x) if feat.am else None,
            (K.to_time_major(alive.astype(jnp.int32)) if feat.finish
             else flat(active0.astype(jnp.int32))),
            flat(p["b0"]), flat(p["b1"]), flat(p["b2"]),
            flat(p["na1"]), flat(p["na2"]),
            flat(use_flt.astype(jnp.int32)), flat(use_sm.astype(jnp.int32)),
            flat(amp_), flat(smoothing),
            flat(am_self.astype(jnp.int32)), flat(p["amp_mod_depth"]),
            flat(hold_on.astype(jnp.int32)), flat(hm.astype(jnp.int32)),
            flat((p["quantize"] != 0).astype(jnp.int32)),
            flat(levels) if feat.quant else None,
            flat(inv_levels) if feat.quant else None,
            flat(carry["x1"]), flat(carry["x2"]), flat(carry["y1"]),
            flat(carry["y2"]), flat(carry["smoother"]),
            flat(carry["hold_count"].astype(I32)), flat(carry["hold_val"]),
            exact=exact, feat=kfeat)
        samples = K.from_time_major(outs[0], B_, V_)
        (new_x1, new_x2, new_y1, new_y2, new_smoother, new_hold_count,
         new_hold_val) = (o.reshape(B_, V_) for o in outs[1:])
    else:
        alive_nm = alive if feat.finish \
            else jnp.broadcast_to(active0[..., None], f.shape)
        if feat.hold:
            # ---- sample & hold ----
            tpos = jnp.arange(N_, dtype=I32)
            sh_cnt = (carry["hold_count"][..., None]
                      + tpos[None, None, :]) % hm[..., None]
            is_hold = sh_cnt == 0
            # forward-fill of f at hold positions (no gather): associative
            # scan on (value, seen) pairs, later holds override earlier
            seed = jnp.concatenate(
                [jnp.ones_like(is_hold[..., :1]), is_hold[..., 1:]], axis=-1)
            seed0 = jnp.where(is_hold[..., :1], f[..., :1],
                              carry["hold_val"][..., None])
            vals = jnp.concatenate([seed0, f[..., 1:]], axis=-1)

            def ff_combine(l, r):
                lv, ls = l
                rv, rs = r
                return jnp.where(rs, rv, lv), ls | rs

            held, _ = jax.lax.associative_scan(ff_combine, (vals, seed),
                                               axis=-1)
            s1 = jnp.where(hold_on[..., None], held, f)
            new_hold_count = jnp.where(hold_on & any_alive,
                                       (carry["hold_count"] + cnt) % hm,
                                       carry["hold_count"])
            new_hold_val = jnp.where(hold_on & any_alive, at_last(held),
                                     carry["hold_val"])
        else:
            s1 = f
            new_hold_count = carry["hold_count"]
            new_hold_val = carry["hold_val"]

        if feat.quant:
            # ---- quantizer ----
            iv = _fma32(s1, levels[..., None], F32(0.5)).astype(I32) \
                .astype(F32)
            s2 = jnp.where((p["quantize"] != 0)[..., None],
                           iv * inv_levels[..., None], s1)
        else:
            s2 = s1

        env_nm = env if feat.env else jnp.broadcast_to(F32(1.0), s2.shape)
        am_nm = ampmod_x if feat.am else jnp.broadcast_to(F32(1.0), s2.shape)

        def fs_step(c, xs):
            x1, x2, y1, y2, sg = c
            x_t, env_t, amod_t, alive_t = xs
            if feat.flt:
                flt = p["b1"] * x1
                flt = _fma(p["b0"], x_t, flt, exact)
                flt = _fma(p["b2"], x2, flt, exact)
                flt = _fma(p["na1"], y1, flt, exact)
                flt = _fma(p["na2"], y2, flt, exact)
                s3_t = jnp.where(use_flt, flt, x_t)
                upd = alive_t & use_flt
                nx1 = jnp.where(upd, x_t, x1)
                nx2 = jnp.where(upd, x1, x2)
                ny1 = jnp.where(upd, flt, y1)
                ny2 = jnp.where(upd, y1, y2)
            else:
                s3_t = x_t
                nx1, nx2, ny1, ny2 = x1, x2, y1, y2
            if feat.am_self:
                amod = jnp.where(am_self, s3_t * p["amp_mod_depth"], amod_t)
            else:
                amod = amod_t
            final_t = amp_ * env_t * amod
            if feat.sm:
                sg2 = _fma(smoothing, final_t - sg, sg, exact)
                final2 = jnp.where(use_sm, sg2, final_t)
                nsg = jnp.where(alive_t & use_sm, sg2, sg)
            else:
                final2 = final_t
                nsg = sg
            out_t = jnp.where(alive_t, s3_t * final2, F32(0.0))
            return (nx1, nx2, ny1, ny2, nsg), out_t

        (nx1, nx2, ny1, ny2, nsg), samples_seq = jax.lax.scan(
            fs_step,
            (carry["x1"], carry["x2"], carry["y1"], carry["y2"],
             carry["smoother"]),
            (jnp.moveaxis(s2, -1, 0), jnp.moveaxis(env_nm, -1, 0),
             jnp.moveaxis(am_nm, -1, 0), jnp.moveaxis(alive_nm, -1, 0)))
        samples = jnp.moveaxis(samples_seq, 0, -1)
        new_x1, new_x2, new_y1, new_y2 = nx1, nx2, ny1, ny2
        new_smoother = nsg

    # ---- contribution mask ----
    # Pan + mix are applied by the CALLER over all lanes at once: pan
    # only scales a voice's contribution to the stereo mix
    # (synth.c:630-641), it never feeds sample generation, so it needs
    # neither in-pass state nor tier ordering — pan-mod edges are
    # excluded from the tier DAG (parallel/batch.py _union_depths) and
    # the trailing pm-only tiers they used to force disappear.
    if feat.disc:
        nodisc = p["disconnect"] == 0
        contrib = (alive & nodisc[..., None]) if feat.finish \
            else (active0 & nodisc)[..., None]
    else:
        contrib = alive if feat.finish else active0[..., None]
    # last-alive index per lane: the caller's pan-carry update takes the
    # pan sequence at this index (N-1 when no one-shot voice dies)
    il_out = il if feat.finish else jnp.full_like(cnt, N_ - 1)

    new_carry = dict(
        phase=new_phase, finished=new_finished, sample=samples[..., -1],
        hold_count=new_hold_count, hold_val=new_hold_val,
        x1=new_x1, x2=new_x2, y1=new_y1, y2=new_y2,
        smoother=new_smoother, pan_l=carry["pan_l"], pan_r=carry["pan_r"],
    )
    return samples, contrib, (any_alive, il_out), new_carry, None, None


def _mega_pass(carry, p, counts, table_buffer, exact, feat, N, B, V_,
               inc_row, reads, active0, fin_prev, adv_v,
               lo, hi, L, os_noloop, tsize_f, use_fm=None, mis=None,
               mixw=None, fold_bank=None):
    """Single-pallas-call tier pass (kernels.tier_pallas): the whole
    per-voice DSP chain — phase walk, CZ warp, table lookup, envelope,
    S&H/quant/biquad/smoother — in one VMEM-resident kernel.  Replaces
    the 3-kernel chain plus its inter-stage [B, V, N] HBM glue (the
    measured majority cost of the heavy benchmark buckets).  Numerics:
    the CZ warp divides via kernels._kdiv (bit-equal to render._div32),
    the envelope is amplitude-only (native divide, ~1 ulp); dead samples
    come back as exact zeros so the caller needs only per-lane masks."""
    from skred_tpu.engine import kernels as K

    tvv = K.to_vm_vec
    i32v = lambda a: tvv(jnp.asarray(a).astype(I32))
    f32v = lambda a: tvv(jnp.asarray(a).astype(F32))
    vecs = {
        "base_off": i32v(p["table_off"]),   # FULL flat offset: the kernel
        # resolves global indices via windowed DMA (any table size)
        "clip_i": i32v(jnp.maximum(p["table_size"] - 1, 0)),
        "adv": i32v(adv_v), "act": i32v(active0),
        "lo": f32v(lo), "hi": f32v(hi), "L": f32v(L),
        "amp": f32v(p["amp"]),
    }
    slot = i32v(p["table_off"] // 32768)
    if feat.finish:
        vecs["osn"] = i32v(os_noloop)
        vecs["one_shot"] = i32v(p["one_shot"])
    if feat.cz:
        vecs.update(cz_mode=i32v(p["cz_mode"]),
                    cz_dist=f32v(p["cz_distortion"]), tsize=f32v(tsize_f))
    if feat.env:
        vecs.update(use_env=i32v(p["use_amp_envelope"]),
                    env_active=i32v(p["env_active"]),
                    env_start=i32v(p["env_start"]),
                    env_rel_at=i32v(p["env_rel_at"]),
                    att=f32v(p["env_attack"]), dec=f32v(p["env_decay"]),
                    sus=f32v(p["env_sustain"]), rel=f32v(p["env_release"]),
                    vel=f32v(p["env_velocity"]))
    if feat.flt:
        vecs.update(b0=f32v(p["b0"]), b1=f32v(p["b1"]), b2=f32v(p["b2"]),
                    na1=f32v(p["na1"]), na2=f32v(p["na2"]),
                    use_flt=i32v(p["filter_mode"] != 0))
    if feat.sm:
        vecs.update(use_sm=i32v(p["smoother_enable"]),
                    smoothing=f32v(p["smoother_smoothing"]))
    if feat.am_self:
        vecs.update(am_self=i32v(p["am_self"]),
                    am_depth=f32v(p["amp_mod_depth"]))
    if feat.hold:
        vecs.update(hold_on=i32v(p["hold_max"] != 0),
                    hold_max=i32v(jnp.maximum(p["hold_max"], 1)))
    if feat.quant:
        levels = (jnp.left_shift(jnp.int32(1), p["quantize"]) - 1).astype(F32)
        inv_levels = _div32(F32(1.0), jnp.maximum(levels, F32(1.0)))
        vecs.update(quant_on=i32v(p["quantize"] != 0), levels=f32v(levels),
                    inv_levels=f32v(inv_levels))
    states = {"phase": f32v(carry["phase"]),
              "finished": i32v(carry["finished"])}
    if feat.flt:
        states.update({k: f32v(carry[k]) for k in ("x1", "x2", "y1", "y2")})
    if feat.sm:
        states["smoother"] = f32v(carry["smoother"])
    if feat.hold:
        states["hold_count"] = i32v(carry["hold_count"])
        states["hold_val"] = f32v(carry["hold_val"])

    # raw modulator-read streams: inc/dm/amod arithmetic happens
    # in-kernel (bit-equal fma/mult order), not as [B,V,N] XLA glue.
    # Folded streams (fold_bank) skip even the [N, M] stream arrays:
    # the kernel slices the producer tiers' voice-major bank directly.
    bank, srows = fold_bank if fold_bank is not None else (None, {})
    if feat.fm:
        inc_in = None if "fm" in srows else K.to_vm_seq(reads["fm"])
        vecs.update(use_fm=i32v(use_fm), mis=f32v(mis),
                    pinc=f32v(p["phase_inc"]),
                    fm_depth=f32v(p["freq_mod_depth"]))
        if "fm" in srows:
            vecs["fm_del"] = i32v(p["fm_delayed"])
        if feat.direction:
            vecs["dirneg"] = i32v(p["direction"] != 0)
    else:
        inc_in = f32v(inc_row)
    if feat.cz and feat.czm:
        dm_in = None if "cz" in srows else K.to_vm_seq(reads["cz"])
        vecs.update(cm_ge0=i32v(p["cz_mod_osc"] >= 0),
                    cz_depth=f32v(p["cz_mod_depth"]))
        if "cz" in srows:
            vecs["cz_del"] = i32v(p["cm_delayed"])
    elif feat.cz:
        dm_in = f32v(jnp.where(p["cz_mod_osc"] >= 0, F32(0.0), F32(1.0)))
    else:
        dm_in = None
    if feat.am:
        amod_in = None if "am" in srows else K.to_vm_seq(reads["am"])
        vecs.update(am_ge0=i32v(p["amp_mod_osc"] >= 0),
                    am_depth_a=f32v(p["amp_mod_depth"]))
        if "am" in srows:
            vecs["am_del"] = i32v(p["am_delayed"])
    else:
        amod_in = None
    cbase = counts[:1] if feat.env else jnp.zeros((1,), I32)
    tab2 = table_buffer.reshape(-1, 128)

    mfeat = (feat.fm, feat.cz, feat.czm, feat.env, feat.flt, feat.sm,
             feat.hold, feat.quant, feat.am, feat.am_self, feat.finish,
             feat.direction, tuple(feat.cz_modes), feat.ts_pow2)
    # in-kernel static-pan mix: per-lane stereo weights ride into the
    # kernel and the cross-voice sum finishes in VMEM ([N, B] acc pair);
    # eligible when the batch-chunk rows align with the step width
    b_rows = B // 128 if B % 128 == 0 else 0
    n_seq_k = 1 + (1 if (feat.fm and "fm" not in srows) else 0) \
        + (1 if (feat.cz and feat.czm and "cz" not in srows) else 0) \
        + (1 if (feat.am and "am" not in srows) else 0)
    bank_extra = bank.size * 4 if bank is not None else 0
    import os as _os
    mix_on = (mixw is not None and b_rows > 0
              and _os.environ.get("SKRED_MEGA_MIX", "1") != "0"
              and K.mix_rows(V_ * B, N, n_seq_k, bool(exact), b_rows,
                             bank_extra))
    kmixw = (f32v(mixw[0]), f32v(mixw[1])) if mix_on else None
    out, res = K.tier_pallas(tab2, slot, cbase, inc_in, dm_in, amod_in,
                             vecs, states, feat=mfeat, exact=exact, n=N,
                             mixw=kmixw, b_rows=b_rows if mix_on else 0,
                             bank=bank, srow_fm=srows.get("fm"),
                             srow_cz=srows.get("cz"),
                             srow_am=srows.get("am"))
    # macc carries the raw [N, M] voice-major stream too: pan-mod / mod-
    # source lanes slice it per voice ([N, B] columns), so the full
    # [B, V, N] transpose of ``samples`` stays dead unless est/capture
    # consumers need it; ``out`` is also returned raw for downstream
    # modulator banks (the fold path)
    mix_acc = (res.pop("acc_l"), res.pop("acc_r"), out) \
        if "acc_l" in res else None
    fvv = lambda a: K.from_vm_vec(a, B, V_)
    samples = K.from_vm_seq(out, B, V_)
    cnt = fvv(res["cnt"])
    il = jnp.clip(cnt - 1, 0, N - 1)
    any_alive = cnt >= 1
    new_carry = dict(
        phase=fvv(res["phase"]),
        finished=fvv(res["finished"]).astype(I32) if feat.finish
        else carry["finished"],
        # out_last (mix path) lets XLA dead-code-eliminate the [B, V, N]
        # transpose of ``samples`` when nothing else consumes it
        sample=fvv(res["out_last"]) if "out_last" in res
        else samples[..., -1],
        hold_count=fvv(res["hold_count"]).astype(I32) if feat.hold
        else carry["hold_count"],
        hold_val=fvv(res["hold_val"]) if feat.hold else carry["hold_val"],
        x1=fvv(res["x1"]) if feat.flt else carry["x1"],
        x2=fvv(res["x2"]) if feat.flt else carry["x2"],
        y1=fvv(res["y1"]) if feat.flt else carry["y1"],
        y2=fvv(res["y2"]) if feat.flt else carry["y2"],
        smoother=fvv(res["smoother"]) if feat.sm else carry["smoother"],
        pan_l=carry["pan_l"], pan_r=carry["pan_r"],
    )
    if feat.disc:
        contrib = ((p["disconnect"] == 0) & active0)[..., None]
    else:
        contrib = active0[..., None]
    return samples, contrib, (any_alive, il), new_carry, mix_acc, out


def _apply_ops_b(carry, ops, flag, feat=Feat()):
    c = dict(carry)
    c["phase"] = jnp.where(flag & ops["set_phase"], ops["phase"], carry["phase"])
    c["finished"] = jnp.where(flag & ops["set_finished"], ops["finished"],
                              carry["finished"])
    c["sample"] = jnp.where(flag & ops["set_sample"], ops["sample"],
                            carry["sample"])
    for k in ("x1", "x2", "y1", "y2"):
        c[k] = jnp.where(flag & ops["clear_filter"], F32(0.0), carry[k])
    c["smoother"] = jnp.where(flag & ops["set_smoother"], ops["smoother"],
                              carry["smoother"])
    c["pan_l"] = jnp.where(flag & ops["set_pan"], ops["pan_left"], carry["pan_l"])
    c["pan_r"] = jnp.where(flag & ops["set_pan"], ops["pan_right"], carry["pan_r"])
    if not feat.hold_copy:
        return c
    src = jnp.maximum(ops["copy_hold_from"], 0)
    do = flag & (ops["copy_hold_from"] >= 0)
    c["hold_count"] = jnp.where(do, jnp.take_along_axis(carry["hold_count"], src, axis=1),
                                c["hold_count"])
    c["hold_val"] = jnp.where(do, jnp.take_along_axis(carry["hold_val"], src, axis=1),
                              c["hold_val"])
    return c


def make_carry0(B, Vp):
    return dict(
        phase=jnp.zeros((B, Vp), F32), finished=jnp.zeros((B, Vp), I32),
        sample=jnp.zeros((B, Vp), F32), hold_count=jnp.zeros((B, Vp), I32),
        hold_val=jnp.zeros((B, Vp), F32),
        x1=jnp.zeros((B, Vp), F32), x2=jnp.zeros((B, Vp), F32),
        y1=jnp.zeros((B, Vp), F32), y2=jnp.zeros((B, Vp), F32),
        smoother=jnp.zeros((B, Vp), F32), pan_l=jnp.zeros((B, Vp), F32),
        pan_r=jnp.zeros((B, Vp), F32), vol_gain=jnp.zeros((B,), F32),
    )


@functools.partial(jax.jit, static_argnames=("num_blocks", "block",
                                             "mod_passes", "capture", "exact",
                                             "use_pallas", "n_src", "feat",
                                             "tiers", "feat_tiers",
                                             "mega_tiers", "fold_tiers"))
def _fused_jit(params, ops, seg_of_block, seg_is_start, table_buffer, noise,
               num_blocks, block, mod_passes, capture, exact=False,
               use_pallas=False, n_src=0, feat=Feat(), tiers=None,
               feat_tiers=None, mega_tiers=None, fold_tiers=None):
    B, _, Vp = params["amp"].shape
    carry0 = make_carry0(B, Vp)
    _, outs = _fused_scan(carry0, params, ops, seg_of_block, seg_is_start,
                          table_buffer, noise, 0, num_blocks, block,
                          mod_passes, capture, exact, use_pallas, n_src, feat,
                          tiers, feat_tiers, mega_tiers, fold_tiers)
    return outs


@functools.partial(jax.jit, static_argnames=("num_blocks", "block",
                                             "mod_passes", "exact",
                                             "use_pallas", "n_src", "feat",
                                             "tiers", "feat_tiers",
                                             "mega_tiers", "fold_tiers"),
                   donate_argnums=(0,))
def _fused_chunk_jit(carry, params, ops, seg_of_block, seg_is_start,
                     table_buffer, noise, block0, num_blocks, block,
                     mod_passes, exact=False, use_pallas=False, n_src=0,
                     feat=Feat(), tiers=None, feat_tiers=None,
                     mega_tiers=None, fold_tiers=None):
    """One streaming chunk: render `num_blocks` blocks starting at global
    block index `block0` (traced), carrying state in/out (donated: the
    chunk loop never reuses the previous carry).

    seg_of_block / seg_is_start / noise may be FULL-RENDER arrays — the
    per-chunk window is sliced here, ON DEVICE, at the traced offset.
    The streaming callers upload each of them exactly once per render:
    per-chunk host work is then one scalar (block0) + the dispatch, so
    the host never sits between the device and its next chunk shipping
    [B, nb]-sized windows through the device tunnel (the measured
    dispatch gap: device-busy was 24-32% of bench wall in round 3).
    Noise-free buckets pass a (1,) dummy, which the shape rule leaves
    alone; single-segment buckets keep their full seg arrays (ops still
    fire at block 0 via _apply_ops_b) and XLA dead-code-eliminates the
    unused seg_of_block slice."""
    if seg_of_block.shape[1] > num_blocks:
        seg_of_block = jax.lax.dynamic_slice_in_dim(
            seg_of_block, block0, num_blocks, axis=1)
        seg_is_start = jax.lax.dynamic_slice_in_dim(
            seg_is_start, block0, num_blocks, axis=1)
    if noise.ndim == 1 and noise.shape[0] > num_blocks * block:
        noise = jax.lax.dynamic_slice_in_dim(
            noise, block0 * block, num_blocks * block, axis=0)
    return _fused_scan(carry, params, ops, seg_of_block, seg_is_start,
                       table_buffer, noise, block0, num_blocks, block,
                       mod_passes, False, exact, use_pallas, n_src, feat,
                       tiers, feat_tiers, mega_tiers, fold_tiers)


def _pack_by_dtype(arrs: dict, Vp: int):
    """Group [B, S, Vp]-shaped arrays by dtype and stack each group into
    one [B, S, P, Vp] tensor, so the per-block segment gather is a few
    big dynamic slices instead of one per parameter (~75 gathers/block
    otherwise — pure scalar-core overhead inside the block scan)."""
    groups = {}
    rest = []
    for k in sorted(arrs):
        v = arrs[k]
        if v.ndim == 3 and v.shape[2] == Vp:
            groups.setdefault(jnp.dtype(v.dtype).name, []).append(k)
        else:
            rest.append(k)
    stacked = {dt: jnp.stack([arrs[k] for k in keys], axis=2)
               for dt, keys in groups.items()}
    return groups, stacked, rest


def _fused_scan(carry0, params, ops, seg_of_block, seg_is_start, table_buffer,
                noise, block0, num_blocks, block, mod_passes, capture, exact,
                use_pallas, n_src=0, feat=Feat(), tiers=None,
                feat_tiers=None, mega_tiers=None, fold_tiers=None):
    B, _, Vp = params["amp"].shape
    if use_pallas and mega_tiers and any(mega_tiers):
        # the megakernel views the buffer as 32768-sample slots
        tb_pad = (-table_buffer.shape[0]) % 32768
        if tb_pad:
            table_buffer = jnp.concatenate(
                [table_buffer,
                 jnp.zeros((tb_pad,), table_buffer.dtype)])
    # pan-mod does not feed sample generation (pan is applied globally
    # after all tiers) and CZ warp without CZ-mod edges reads nothing,
    # so neither alone needs modulator estimates
    any_mod = feat.fm or (feat.cz and feat.czm) or feat.am
    _CK = ("phase", "finished", "sample", "hold_count", "hold_val",
           "x1", "x2", "y1", "y2", "smoother", "pan_l", "pan_r")
    p_groups, p_stacked, p_rest = _pack_by_dtype(params, Vp)
    o_groups, o_stacked, o_rest = _pack_by_dtype(ops, Vp)

    def _gather(groups, stacked, rest, arrs, seg):
        ar = jnp.arange(B)
        out = {}
        for dt, keys in groups.items():
            blk = stacked[dt][ar, seg]              # [B, P, Vp]
            for i, k in enumerate(keys):
                out[k] = blk[:, i]
        for k in rest:
            out[k] = arrs[k][ar, seg]
        return out

    # single-segment batches (no mid-render param changes anywhere in the
    # bucket) need no per-block segment gather: hoist the [B, P, Vp]
    # selects out of the scan entirely
    single_seg = all(v.shape[1] == 1 for v in params.values()) \
        and all(v.shape[1] == 1 for v in ops.values())
    if single_seg:
        p_const = {k: v[:, 0] for k, v in params.items()}
        o_const = {k: v[:, 0] for k, v in ops.items()}

    # pan-mod lanes are a static set (feat.pm_lanes): the pan+mix stage
    # needs per-sample pan only for them, so with capture off the mix
    # runs tier-locally (static-pan lanes sum straight out of each
    # tier's kernel) plus a compact [B, P, N] pan-mod slab — the full
    # [B, Vp, N] sample/pred materializations (the dominant non-kernel
    # device cost of the heavy pm buckets: 48.sk, 909.sk) never exist.
    PMS = tuple(feat.pm_lanes) if feat.pm else ()
    SRC = tuple(feat.pm_srcs)

    def _mix_parts(carry, p, parts):
        """Stereo mix from per-tier kernel outputs.

        parts: list of (samples_t [B,V_t,N], contrib_t [B,V_t,1|N],
        aa_t, il_t, (ts, te), macc) in packed order; ``macc`` is the
        tier kernel's in-kernel static-pan accumulator pair ([N, B]
        each, kernels phase 5) or None.  Returns (mix_l, mix_r, pan
        carry updates or None).  Per-lane TERMS are identical to the
        full concat path: masked lanes render exact zeros (kernel
        contract), so samples*where(c,pan,0) == where(c, samples*pan, 0),
        and the compact pan-mod read keeps one-hot semantics (0 + x is
        exact).  The REDUCTION is reassociated: pan-mod lanes sum after
        the static-pan partials instead of in packed lane order (and the
        in-kernel accumulator sums voices in grid-step order), so the
        mix paths can differ at ULP level (well inside the −60 dB
        parity gate; corpus-verified on chip)."""
        mix_l = mix_r = None
        acc_l = acc_r = None
        pm_s, pm_c, pm_aa, pm_il, src_s = [], [], [], [], []
        for samples_t, contrib_t, aa_t, il_t, (ts_, te), macc in parts:
            B = samples_t.shape[0]

            def lane_cols(idx):
                """[B, len(idx), N] voice streams without the full
                [B, V, N] transpose: per-voice [N, B] column slices of
                the raw kernel output."""
                if macc is None:
                    return samples_t[:, idx]
                cols = jnp.stack([macc[2][:, v * B:(v + 1) * B]
                                  for v in idx], axis=1)    # [N, P, B]
                return jnp.transpose(cols, (2, 1, 0))
            loc = [v - ts_ for v in PMS if ts_ <= v < te]
            if loc:
                pm_s.append(lane_cols(loc))
                pm_c.append(jnp.broadcast_to(contrib_t[:, loc],
                                             (B, len(loc), block)))
                pm_aa.append(aa_t[:, loc])
                pm_il.append(il_t[:, loc])
            sloc = [v - ts_ for v in SRC if ts_ <= v < te]
            if sloc:
                src_s.append(lane_cols(sloc))
            if macc is not None:
                # static-pan lanes already summed in VMEM (pm lanes were
                # zero-weighted in the kernel): [N, B] partials
                acc_l = macc[0] if acc_l is None else acc_l + macc[0]
                acc_r = macc[1] if acc_r is None else acc_r + macc[1]
                continue
            wl = jnp.where(contrib_t, carry["pan_l"][:, ts_:te, None],
                           F32(0.0))
            wr = jnp.where(contrib_t, carry["pan_r"][:, ts_:te, None],
                           F32(0.0))
            if loc:
                stat = np.ones((1, te - ts_, 1), bool)
                stat[0, loc, 0] = False
                wl = jnp.where(stat, wl, F32(0.0))
                wr = jnp.where(stat, wr, F32(0.0))
            l_t = (samples_t * wl).sum(axis=1)
            r_t = (samples_t * wr).sum(axis=1)
            mix_l = l_t if mix_l is None else mix_l + l_t
            mix_r = r_t if mix_r is None else mix_r + r_t
        if acc_l is not None:
            al = jnp.swapaxes(acc_l, 0, 1)            # [N, B] → [B, N]
            ar = jnp.swapaxes(acc_r, 0, 1)
            mix_l = al if mix_l is None else mix_l + al
            mix_r = ar if mix_r is None else mix_r + ar
        if not PMS:
            return mix_l, mix_r, None
        pms = jnp.concatenate(pm_s, axis=1) if len(pm_s) > 1 else pm_s[0]
        cpm = jnp.concatenate(pm_c, axis=1) if len(pm_c) > 1 else pm_c[0]
        aa = jnp.concatenate(pm_aa, axis=1) if len(pm_aa) > 1 else pm_aa[0]
        il = jnp.concatenate(pm_il, axis=1) if len(pm_il) > 1 else pm_il[0]
        lanes = list(PMS)
        pm_osc = p["pan_mod_osc"][:, lanes]
        if SRC:
            est = (jnp.concatenate(src_s, axis=1) if len(src_s) > 1
                   else src_s[0])
            sel = (pm_osc[..., None]
                   == np.asarray(SRC, np.int32)).astype(F32)
            src = jnp.einsum("bpm,bmt->bpt", sel, est,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            src_last = jnp.einsum(
                "bpm,bm->bp", sel, carry["sample"][:, list(SRC)],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            shifted = jnp.concatenate([src_last[..., None], src[..., :-1]],
                                      axis=-1)
            pm_read = jnp.where(
                (p["pm_delayed"][:, lanes] != 0)[..., None], shifted, src)
        else:
            pm_read = jnp.zeros_like(pms)
        if feat.pm_self:
            pm_read = jnp.where((p["pm_self"][:, lanes] != 0)[..., None],
                                pms, pm_read)
        qv = pm_read * p["pan_mod_depth"][:, lanes][..., None]
        pan_mod_on = (pm_osc >= 0) & (p["disconnect"][:, lanes] == 0)
        pl = jnp.where(pan_mod_on[..., None], (F32(1.0) - qv) * F32(0.5),
                       carry["pan_l"][:, lanes, None])
        pr = jnp.where(pan_mod_on[..., None], (F32(1.0) + qv) * F32(0.5),
                       carry["pan_r"][:, lanes, None])
        mix_l = mix_l + jnp.where(cpm, pms * pl, F32(0.0)).sum(axis=1)
        mix_r = mix_r + jnp.where(cpm, pms * pr, F32(0.0)).sum(axis=1)
        # pan carry freezes at the last alive sample (the reference
        # stops updating a finished voice's pan state)
        oh_last = (il[..., None]
                   == np.arange(block, dtype=np.int32)).astype(F32)
        act_pan = pan_mod_on & aa
        new_pl = jnp.where(act_pan, (pl * oh_last).sum(axis=-1),
                           carry["pan_l"][:, lanes])
        new_pr = jnp.where(act_pan, (pr * oh_last).sum(axis=-1),
                           carry["pan_r"][:, lanes])
        return mix_l, mix_r, (lanes, new_pl, new_pr)

    def block_step(carry, k):
        if single_seg:
            p, o = p_const, o_const
        else:
            seg = seg_of_block[:, k]                # [B]
            p = _gather(p_groups, p_stacked, p_rest, params, seg)
            o = _gather(o_groups, o_stacked, o_rest, ops, seg)
        carry = _apply_ops_b(carry, o, seg_is_start[:, k][:, None], feat)
        counts = ((block0 + k) * block + 1 + jnp.arange(block)).astype(I32) \
            if feat.env else None
        nblk = jax.lax.dynamic_slice_in_dim(noise, k * block, block) \
            if feat.noise else None

        if tiers is not None and len(tiers) > 1:
            # tiered evaluation: lanes are packed by modulation-DAG depth
            # (parallel/batch.py pack_stacked), tier k reads only earlier
            # tiers — every voice renders exactly once per block, in place
            # of repeated full fixed-point passes.  Numerics identical:
            # each voice still computes from fully-converged modulators.
            #
            # Modulator estimates are the rendered-so-far slab (``done``),
            # NOT a [B, Vp, N] broadcast of the previous block updated
            # tier-by-tier with dynamic_update_slice: every sample-feeding
            # edge targets an earlier tier by construction (timeline
            # _fused_passes counts delayed edges too — a delayed read is a
            # ONE-SAMPLE shift of the modulator's current block, so it
            # still needs the modulator rendered first), which makes the
            # never-rendered columns unreadable.  Reads whose one-hot
            # selector points past ``done`` (osc -1, or a depth-0 read of
            # a later tier whose value multiplies to zero anyway) resolve
            # to 0.0 exactly as they did against the stale-broadcast
            # columns (read × depth-0 == 0 either way).  Saves the
            # broadcast + per-tier 2·[B,Vp,N] update-slice HBM round trip.
            full = {"sample": carry["sample"], "phase_inc": p["phase_inc"]}
            bounds = [0]
            for t in tiers:
                bounds.append(bounds[-1] + t)
            # Pan + mix need the concatenated [B, Vp, N] slabs only when
            # the caller captures per-voice streams.  Otherwise each
            # tier mixes straight out of its own kernel output via
            # _mix_parts (pan-mod lanes ride a compact static slab), so
            # the [B, Vp, N] mask broadcast + cross-tier concat — the
            # largest non-kernel device cost in PROFILE_ROOFLINE.json
            # (pred[B,15,N] materialization and its async copies) —
            # never exists.
            need_full = capture
            s_parts, cb_parts = [], []
            aa_parts, il_parts = [], []
            nc_parts, mix_parts = [], []
            mix_l = mix_r = pan_upd = None
            done = None
            done_vm = []                # raw [N, M_t] outs (fold banks)
            ftl = fold_tiers if (fold_tiers is not None
                                 and not capture) else None
            from skred_tpu.engine import kernels as KK
            for ti, (ts_, te) in enumerate(zip(bounds[:-1], bounds[1:])):
                p_t = {kk: (vv[:, ts_:te]
                            if not kk.startswith(("med_map", "big_map"))
                            and vv.ndim == 2 and vv.shape[1] == Vp
                            else vv) for kk, vv in p.items()}
                c_t = {kk: (vv[:, ts_:te] if vv.ndim == 2 else vv)
                       for kk, vv in carry.items()}
                # per-tier static flags: this tier's pass and kernels
                # carry only the stages its own lanes use
                ft = feat_tiers[ti] if feat_tiers is not None else feat
                mg = bool(mega_tiers[ti]) if mega_tiers else False
                mixw_t = None
                if mg and not need_full and not ft.noise:
                    # per-lane stereo weights for the in-kernel mix:
                    # pan · (active & connected), pan-mod lanes zeroed
                    # (they ride the compact slab in _mix_parts)
                    act2 = p_t["amp"] != 0.0
                    if ft.disc:
                        act2 = act2 & (p_t["disconnect"] == 0)
                    wl2 = jnp.where(act2, carry["pan_l"][:, ts_:te],
                                    F32(0.0))
                    wr2 = jnp.where(act2, carry["pan_r"][:, ts_:te],
                                    F32(0.0))
                    loc_w = [v - ts_ for v in PMS if ts_ <= v < te]
                    if loc_w:
                        stat_w = np.ones((1, te - ts_), np.float32)
                        stat_w[0, loc_w] = 0.0
                        wl2 = wl2 * stat_w
                        wr2 = wr2 * stat_w
                    mixw_t = (wl2, wr2)
                fold_arg = None
                est_arg = done
                if ftl is not None and ftl[ti] and mg:
                    # modulator-bank fold: reads resolve in-kernel from
                    # the earlier tiers' raw voice-major outputs (row 0
                    # = previous block's last samples, the delayed-read
                    # value)
                    prev_vm = KK.to_vm_vec(carry["sample"][:, :ts_])
                    cat = done_vm[0] if len(done_vm) == 1 \
                        else jnp.concatenate(done_vm, axis=1)
                    bank = jnp.concatenate([prev_vm[None, :], cat],
                                           axis=0)       # [N+1, M_ear]
                    brows_ = B // 128
                    spv = B // 1024
                    vloc = np.repeat(np.arange(te - ts_), spv)
                    cw8 = np.tile(np.arange(spv) * 8, te - ts_)
                    cap_row = np.int32(ts_ * brows_ - 8)

                    def srow_of(name, p_t=p_t):
                        osc_row = jnp.maximum(p_t[name][0],
                                              0).astype(jnp.int32)
                        return jnp.minimum(
                            osc_row[vloc] * jnp.int32(brows_)
                            + jnp.asarray(cw8, jnp.int32), cap_row)

                    srows = {}
                    if ft.fm:
                        srows["fm"] = srow_of("freq_mod_osc")
                    if ft.cz and ft.czm:
                        srows["cz"] = srow_of("cz_mod_osc")
                    if ft.am:
                        srows["am"] = srow_of("amp_mod_osc")
                    fold_arg = (bank, srows)
                    est_arg = None          # no glue-side reads at all
                (samples_t, contrib_t, (aa_t, il_t), nc_t,
                 macc_t, out_vm_t) = _voice_block_pass(
                    est_arg, c_t, p_t, nblk, counts, table_buffer,
                    exact, use_pallas, ft, N=block, full=full,
                    rk=f"_t{ti}", mega=mg, mixw=mixw_t,
                    fold_bank=fold_arg)
                later = range(ti + 1, len(tiers))
                if any_mod and ti + 1 < len(tiers) and any(
                        not (ftl[tj] if ftl is not None else False)
                        for tj in later):
                    done = samples_t if done is None else \
                        jnp.concatenate([done, samples_t], axis=1)
                if ftl is not None and any(ftl[tj] for tj in later):
                    done_vm.append(out_vm_t if out_vm_t is not None
                                   else KK.to_vm_seq(samples_t))
                nc_parts.append(nc_t)
                if need_full:
                    s_parts.append(samples_t)
                    # [B, V_t, 1] when the tier has no one-shot voices
                    cb_parts.append(jnp.broadcast_to(contrib_t,
                                                     samples_t.shape))
                    aa_parts.append(aa_t)
                    il_parts.append(il_t)
                else:
                    mix_parts.append((samples_t, contrib_t, aa_t, il_t,
                                      (ts_, te), macc_t))
            new_carry = {kk: jnp.concatenate([nc[kk] for nc in nc_parts],
                                             axis=1) for kk in _CK}
            if need_full:
                samples = jnp.concatenate(s_parts, axis=1)
                contrib = jnp.concatenate(cb_parts, axis=1)
                any_alive = jnp.concatenate(aa_parts, axis=1)
                il = jnp.concatenate(il_parts, axis=1)
            else:
                mix_l, mix_r, pan_upd = _mix_parts(carry, p, mix_parts)
        else:
            # single tier (rosters named "_t0") or cyclic-union fallback
            # (repeat-passes layout, global roster names)
            rk = "_t0" if tiers is not None else ""
            mg = bool(mega_tiers[0]) if mega_tiers else False
            # fixed-point layouts DO read not-yet-converged columns: the
            # estimate starts as the previous block's last samples
            est = jnp.broadcast_to(carry["sample"][..., None],
                                   (B, Vp, block)).astype(F32) \
                if any_mod else None
            if n_src and n_src < Vp and mod_passes > 1:
                # the rosters hold packed voice indices, not per-voice
                # data — entries >= n_src one-hot to zero in the prefix
                p_src = {kk: (vv[:, :n_src]
                              if not kk.startswith(("med_map", "big_map"))
                              and vv.ndim == 2 and vv.shape[1] == Vp
                              else vv) for kk, vv in p.items()}
                c_src = {kk: (vv[:, :n_src] if vv.ndim == 2 else vv)
                         for kk, vv in carry.items()}
                for _ in range(mod_passes - 1):
                    s_src, _, _, _, _, _ = _voice_block_pass(
                        est[:, :n_src], c_src, p_src, nblk, counts,
                        table_buffer, exact, use_pallas, feat, N=block,
                        rk=rk, mega=mg)
                    est = jnp.concatenate([s_src, est[:, n_src:]], axis=1)
            else:
                for _ in range(mod_passes - 1):
                    samples, _, _, _, _, _ = _voice_block_pass(
                        est, carry, p, nblk, counts, table_buffer, exact,
                        use_pallas, feat, N=block, rk=rk, mega=mg)
                    est = samples
            mixw_1 = None
            if mg and not capture and not feat.noise:
                act2 = p["amp"] != 0.0
                if feat.disc:
                    act2 = act2 & (p["disconnect"] == 0)
                wl2 = jnp.where(act2, carry["pan_l"], F32(0.0))
                wr2 = jnp.where(act2, carry["pan_r"], F32(0.0))
                if PMS:
                    stat_w = np.ones((1, Vp), np.float32)
                    stat_w[0, list(PMS)] = 0.0
                    wl2 = wl2 * stat_w
                    wr2 = wr2 * stat_w
                mixw_1 = (wl2, wr2)
            (samples, contrib, (any_alive, il), new_carry,
             macc_1, _ovm) = _voice_block_pass(
                est, carry, p, nblk, counts, table_buffer, exact, use_pallas,
                feat, N=block, rk=rk, mega=mg, mixw=mixw_1)
            if capture:
                mix_l = mix_r = pan_upd = None
                contrib = jnp.broadcast_to(contrib, samples.shape)
            else:
                Vp_ = samples.shape[1]
                mix_l, mix_r, pan_upd = _mix_parts(
                    carry, p, [(samples, contrib, any_alive, il, (0, Vp_),
                                macc_1)])

        if pan_upd is not None:
            lanes, new_pl, new_pr = pan_upd
            idx = np.asarray(lanes, np.int32)
            new_carry["pan_l"] = new_carry["pan_l"].at[:, idx].set(new_pl)
            new_carry["pan_r"] = new_carry["pan_r"].at[:, idx].set(new_pr)

        # ---- capture path: pan over the full [B, Vp, N] slabs (the
        # modulator blocks are the final samples, exact for every
        # tier/pass layout; serial-order delay semantics ride the
        # per-lane pm_delayed flags exactly as the in-pass reads do) ----
        if mix_l is None and feat.pm:
            pm = p["pan_mod_osc"]
            pm_read = _read_block(samples, carry["sample"], pm,
                                  p["pm_delayed"])
            if feat.pm_self:
                pm_read = jnp.where((p["pm_self"] != 0)[..., None], samples,
                                    pm_read)
            qv = pm_read * p["pan_mod_depth"][..., None]
            pan_mod_on = (pm >= 0) & (p["disconnect"] == 0)
            pl = jnp.where(pan_mod_on[..., None],
                           (F32(1.0) - qv) * F32(0.5),
                           carry["pan_l"][..., None])
            pr = jnp.where(pan_mod_on[..., None],
                           (F32(1.0) + qv) * F32(0.5),
                           carry["pan_r"][..., None])
            # pan carry freezes at the last alive sample (the reference
            # stops updating a finished voice's pan state)
            oh_last = (il[..., None]
                       == np.arange(block, dtype=np.int32)).astype(F32)
            act_pan = pan_mod_on & any_alive
            new_carry["pan_l"] = jnp.where(
                act_pan, (pl * oh_last).sum(axis=-1), carry["pan_l"])
            new_carry["pan_r"] = jnp.where(
                act_pan, (pr * oh_last).sum(axis=-1), carry["pan_r"])
        elif mix_l is None:
            pl = carry["pan_l"][..., None]
            pr = carry["pan_r"][..., None]
        if mix_l is None:
            left = jnp.where(contrib, samples * pl, F32(0.0))
            right = jnp.where(contrib, samples * pr, F32(0.0))

            # ---- mix + volume smoother ----
            mix_l = left.sum(axis=1)                # [B, N]
            mix_r = right.sum(axis=1)
        vf = p["volume_final"][..., None]
        vg = _affine_scan(jnp.full_like(vf, F32(1.0) - F32(0.002)),
                          F32(0.002) * jnp.broadcast_to(vf, mix_l.shape),
                          carry["vol_gain"])
        out = jnp.stack([mix_l * vg, mix_r * vg], axis=-1)  # [B, N, 2]
        new_carry["vol_gain"] = vg[..., -1]
        if capture:
            return new_carry, (out, jnp.stack([left, right], axis=-1))
        return new_carry, out

    carry, outs = jax.lax.scan(block_step, carry0, jnp.arange(num_blocks))
    return carry, outs


def _feat_tiers(st):
    """Per-tier static feature flags (None when not tiered / single
    tier): tier k's pass compiles only the stages its lanes use."""
    if not st.tiers or len(st.tiers) <= 1:
        return None
    bounds = np.cumsum((0,) + tuple(st.tiers))
    return tuple(compute_feat(st, (int(bounds[i]), int(bounds[i + 1])))
                 for i in range(len(st.tiers)))


def _fold_tiers(st, fts, use_pallas):
    """Static per-tier modulator-bank fold eligibility (see
    kernels._make_tier_kernel ``fold``): a tier's cross-tier modulator
    reads move in-kernel when (a) the read topology (osc index + delay
    flag) is uniform across batch rows — replicated/padded production
    batches and every bench bucket qualify; per-segment values may
    still vary, since the bank-row maps re-prefetch every block —
    (b) the earlier tiers' output bank fits VMEM alongside the step
    planes, (c) 8-row sub-blocks never straddle voices (B % 1024 == 0),
    (d) the am stream carries no self-read (phase 4 resolves that
    serially).  What this deletes per block: the one-hot read einsums,
    the [N, M] read-stream transposes and their HBM round-trips — the
    bulk of the heavy buckets' measured skeleton floor (mega_ablate
    round 5: 8.5 s of stress64's 19.0 s wall).  Reference semantics
    folded: synth.c:548-586 serial-order modulator reads."""
    import os as _os

    from skred_tpu.engine import kernels as K

    if (not use_pallas or not st.tiers or len(st.tiers) <= 1
            or fts is None or K.MEGA_ALIAS or not K.MEGA
            or _os.environ.get("SKRED_MEGA_FOLD", "1") == "0"):
        return None
    B = st.batch
    if B % 1024:
        return None
    p = st.params
    bounds = np.cumsum((0,) + tuple(st.tiers))
    out = [False]
    for ti in range(1, len(st.tiers)):
        ft = fts[ti]
        lo, hi = int(bounds[ti]), int(bounds[ti + 1])
        streams = []
        if ft.fm:
            streams.append(("freq_mod_osc", "fm_delayed"))
        if ft.cz and ft.czm:
            streams.append(("cz_mod_osc", "cm_delayed"))
        if ft.am:
            streams.append(("amp_mod_osc", "am_delayed"))
        ok = bool(streams) and not ft.noise \
            and not (ft.am and ft.am_self)
        if ok:
            for name, dname in streams:
                for nm in (name, dname):
                    a = np.asarray(p[nm])[:, :, lo:hi]
                    if not bool((a == a[:1]).all()):
                        ok = False
                        break
                if not ok:
                    break
        if ok and (st.block + 1) * lo * B * 4 > 48 * 1024 * 1024:
            ok = False
        out.append(bool(ok))
    return tuple(out) if any(out) else None


def _mega_tiers(st):
    """Static per-tier megakernel eligibility (None = megakernel off).

    Every tier is eligible: the kernel's windowed table DMA resolves
    global flat indices at dynamic row offsets, so tables of any size
    (large PCM included) stream through the fused path.  Noise-alt
    tiers are gated by feat.noise inside _voice_block_pass."""
    from skred_tpu.engine import kernels as K

    if not K.MEGA:
        return None
    if st.tiers and len(st.tiers) > 1:
        return tuple(True for _ in st.tiers)
    return (True,)


def _pad_quantum(st, Vp):
    """Batch-padding quantum: every pallas lane group (each tier slice, or
    the n_src prefix / full width in the fallback layout) must flatten to
    a multiple of LANE_QUANTUM (8·128) lanes — the serial kernels' full-
    vreg grid step.  Padding rows are real renders (replicas of the last
    row), so batch fills credit them; the larger quantum also amortizes
    the per-block glue, which is op-overhead-bound, over ~2× the audio."""
    from math import gcd

    from skred_tpu.engine.kernels import LANE_QUANTUM as LQ

    if st.tiers:
        q = 1
        for t in st.tiers:
            r = LQ // gcd(LQ, int(t))
            q = q * r // gcd(q, r)
        return q
    vmin = min(Vp, st.n_src) if st.n_src else Vp
    return LQ // vmin if LQ % vmin == 0 else LQ


def render_fused_stream(st, chunk_blocks: int = 256, noise=None,
                        exact: Optional[bool] = None,
                        use_pallas: Optional[bool] = None,
                        keep_rows: Optional[int] = None):
    """Generator yielding rendered chunks [B, chunk_blocks*block, 2] —
    O(chunk) device memory regardless of render length (the offline
    analog of the reference's bounded callback ring; state carries in a
    pytree exactly as across callbacks).  ``keep_rows`` downloads only
    the first rows of each chunk (device-side slice — replicated/padded
    batches skip the transfer of redundant rows)."""
    from skred_tpu.parallel.batch import _prep_params, pack_stacked

    if st.fused_passes is None:
        raise ValueError("cyclic modulation graph needs the compat engine")
    if "fm_delayed" not in st.params:
        st = pack_stacked(st)
    params = {k: jnp.asarray(v) for k, v in _prep_params(st).items()}
    ops = {k: jnp.asarray(v) for k, v in st.ops.items()}
    Vp = params["amp"].shape[-1]
    B = st.batch
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if exact is None:
        exact = True   # gcc-fma parity everywhere (f32 software fma on TPU)
    table = jnp.asarray(st.table_buffer)
    feat = compute_feat(st)
    fts = _feat_tiers(st)
    mts = _mega_tiers(st) if use_pallas else None
    ftl = _fold_tiers(st, fts, use_pallas)
    carry = make_carry0(B, Vp)
    # one-time uploads: seg maps + the whole noise stream live on device
    # for the full render; each chunk slices its window in-program
    sob = jnp.asarray(np.asarray(st.seg_of_block))
    sis = jnp.asarray(np.asarray(st.seg_is_start))
    if feat.noise:
        n_full = jnp.asarray(
            noise_stream(st.num_blocks * st.block) if noise is None
            else noise[:st.num_blocks * st.block])
    else:
        n_full = jnp.zeros((1,), F32)
    for b0 in range(0, st.num_blocks, chunk_blocks):
        nb = min(chunk_blocks, st.num_blocks - b0)
        carry, outs = _fused_chunk_jit(
            carry, params, ops, sob, sis,
            table, n_full, jnp.int32(b0),
            num_blocks=nb, block=st.block, mod_passes=st.fused_passes,
            exact=exact, use_pallas=use_pallas, n_src=st.n_src, feat=feat,
            tiers=st.tiers, feat_tiers=fts, mega_tiers=mts,
            fold_tiers=ftl)
        r = B if keep_rows is None else min(keep_rows, B)
        yield np.asarray(outs[:, :r]).swapaxes(0, 1) \
            .reshape(r, nb * st.block, 2)


def render_fused_stream_device(st, chunk_blocks: int = 173,
                               exact: Optional[bool] = None,
                               use_pallas: Optional[bool] = None,
                               warmup_only: bool = False) -> float:
    """Streamed render keeping everything on device; returns a checksum
    (|out| sum of the final chunk) to force completion.  The compiled
    chunk shape is duration-independent → the persistent compile cache
    makes repeated benches cheap."""
    from skred_tpu.parallel.batch import _prep_params, pack_stacked

    if st.fused_passes is None:
        raise ValueError("cyclic modulation graph needs the compat engine")
    if "fm_delayed" not in st.params:
        st = pack_stacked(st)
    params0 = _prep_params(st)
    Vp = params0["amp"].shape[-1]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if exact is None:
        exact = True   # gcc-fma parity everywhere (f32 software fma on TPU)
    if use_pallas:
        per = _pad_quantum(st, Vp)
        pad_b = (-st.batch) % max(per, 1)
        if pad_b:
            rep = lambda a: np.concatenate(
                [a, np.repeat(a[-1:], pad_b, axis=0)], axis=0)
            params0 = {k: rep(np.asarray(v)) for k, v in params0.items()}
            st = dataclasses.replace(
                st, ops={k: rep(np.asarray(v)) for k, v in st.ops.items()},
                seg_of_block=rep(np.asarray(st.seg_of_block)),
                seg_is_start=rep(np.asarray(st.seg_is_start)),
                batch=st.batch + pad_b)
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    ops = {k: jnp.asarray(v) for k, v in st.ops.items()}
    table = jnp.asarray(st.table_buffer)
    feat = compute_feat(st)
    fts = _feat_tiers(st)
    mts = _mega_tiers(st) if use_pallas else None
    ftl = _fold_tiers(st, fts, use_pallas)
    B = st.batch
    carry = make_carry0(B, Vp)
    outs = None
    whole = (st.num_blocks // chunk_blocks) * chunk_blocks
    # one-time uploads (see _fused_chunk_jit): seg maps + noise for every
    # whole chunk; the per-chunk loop then does no host->device transfer
    # beyond the block0 scalar — the device streams chunk to chunk
    # without waiting on [B, nb]-sized windows through the tunnel
    sob = jnp.asarray(np.asarray(st.seg_of_block))
    sis = jnp.asarray(np.asarray(st.seg_is_start))
    n_full = jnp.asarray(noise_stream(whole * st.block)) if feat.noise \
        else jnp.zeros((1,), F32)
    for b0 in range(0, whole, chunk_blocks):
        carry, outs = _fused_chunk_jit(
            carry, params, ops, sob, sis,
            table, n_full, jnp.int32(b0),
            num_blocks=chunk_blocks, block=st.block,
            mod_passes=st.fused_passes,
            exact=exact, use_pallas=use_pallas, n_src=st.n_src, feat=feat,
            tiers=st.tiers, feat_tiers=fts, mega_tiers=mts,
            fold_tiers=ftl)
        if warmup_only:
            break
    if outs is None:
        return 0.0
    return float(jnp.sum(jnp.abs(outs[-1])))


def render_fused_device(st, noise=None, exact: Optional[bool] = None,
                        use_pallas: Optional[bool] = None):
    """Like render_fused but keeps the result on device (shape
    [num_blocks, B, block, 2]) — for benchmarking/pipelines where the
    host download would dominate."""
    import jax.numpy as jnp_

    from skred_tpu.parallel.batch import _prep_params, pack_stacked

    if st.fused_passes is None:
        raise ValueError("cyclic modulation graph needs the compat engine")
    if "fm_delayed" not in st.params:
        st = pack_stacked(st)
    if noise is None:
        noise = noise_stream(st.num_blocks * st.block)
    params = _prep_params(st)
    Vp = params["amp"].shape[-1]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if exact is None:
        exact = True   # gcc-fma parity everywhere (f32 software fma on TPU)
    if use_pallas:
        per = _pad_quantum(st, Vp)
        pad_b = (-st.batch) % max(per, 1)
        if pad_b:
            rep = lambda a: np.concatenate(
                [a, np.repeat(a[-1:], pad_b, axis=0)], axis=0)
            params = {k: rep(np.asarray(v)) for k, v in params.items()}
            st = dataclasses.replace(
                st, ops={k: rep(np.asarray(v)) for k, v in st.ops.items()},
                seg_of_block=rep(np.asarray(st.seg_of_block)),
                seg_is_start=rep(np.asarray(st.seg_is_start)),
                batch=st.batch + pad_b)
    params = {k: jnp_.asarray(v) for k, v in params.items()}
    ops = {k: jnp_.asarray(v) for k, v in st.ops.items()}
    fts = _feat_tiers(st)
    return _fused_jit(params, ops, jnp_.asarray(st.seg_of_block),
                      jnp_.asarray(st.seg_is_start),
                      jnp_.asarray(st.table_buffer), jnp_.asarray(noise),
                      num_blocks=st.num_blocks, block=st.block,
                      mod_passes=st.fused_passes, capture=False, exact=exact,
                      use_pallas=use_pallas, n_src=st.n_src,
                      feat=compute_feat(st), tiers=st.tiers,
                      feat_tiers=fts,
                      mega_tiers=_mega_tiers(st) if use_pallas else None,
                      fold_tiers=_fold_tiers(st, fts, use_pallas))


def render_fused(st, noise: Optional[np.ndarray] = None, mesh=None,
                 capture: bool = False, exact: Optional[bool] = None,
                 use_pallas: Optional[bool] = None, pack: bool = True):
    """Render a StackedTimelines batch with the fused engine → [B, T, 2]."""
    from skred_tpu.parallel.batch import _prep_params, pack_stacked

    if st.fused_passes is None:
        raise ValueError(
            "cyclic modulation graph: 1-sample feedback loops require the "
            "compat scan engine (render_stacked)")
    if "fm_delayed" not in st.params:
        st = pack_stacked(st, pack=pack)
    total = st.num_blocks * st.block
    if noise is None:
        noise = noise_stream(total)
    params = _prep_params(st)
    Vp = params["amp"].shape[-1]

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    batch = st.batch
    pad_b = 0
    if use_pallas:
        # pallas lanes: batch·Vp must be a multiple of kernels.LANES
        per = _pad_quantum(st, Vp)
        pad_b = (-batch) % max(per, 1)
        if pad_b:
            rep = lambda a: np.concatenate(
                [a, np.repeat(a[-1:], pad_b, axis=0)], axis=0)
            params = {k: rep(np.asarray(v)) for k, v in params.items()}
            st = dataclasses.replace(
                st,
                ops={k: rep(np.asarray(v)) for k, v in st.ops.items()},
                seg_of_block=rep(np.asarray(st.seg_of_block)),
                seg_is_start=rep(np.asarray(st.seg_is_start)),
                batch=batch + pad_b,
            )

    if mesh is not None:
        pspec = jax.sharding.PartitionSpec("dp")
        bsh = jax.sharding.NamedSharding(mesh, pspec)
        rsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        put_b = lambda a: jax.device_put(np.asarray(a), bsh)
        put_r = lambda a: jax.device_put(np.asarray(a), rsh)
    else:
        put_b = put_r = jnp.asarray

    if exact is None:
        exact = True   # gcc-fma parity everywhere (f32 software fma on TPU)
    params = {k: put_b(v) for k, v in params.items()}
    ops = {k: put_b(v) for k, v in st.ops.items()}
    fts = _feat_tiers(st)
    outs = _fused_jit(params, ops, put_b(st.seg_of_block),
                      put_b(st.seg_is_start), put_r(st.table_buffer),
                      put_r(noise), num_blocks=st.num_blocks, block=st.block,
                      mod_passes=st.fused_passes, capture=capture, exact=exact,
                      use_pallas=use_pallas, n_src=st.n_src,
                      feat=compute_feat(st), tiers=st.tiers,
                      feat_tiers=fts,
                      mega_tiers=_mega_tiers(st) if use_pallas else None,
                      fold_tiers=_fold_tiers(st, fts, use_pallas))
    if capture:
        out, cap = outs
        return (np.asarray(out).swapaxes(0, 1).reshape(st.batch, total, 2)[:batch],
                np.asarray(cap))
    # outs: [NB, B, N, 2] → [B, T, 2]
    return np.asarray(outs).swapaxes(0, 1).reshape(st.batch, total, 2)[:batch]
