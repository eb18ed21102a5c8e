"""The block renderer — the TPU port of the reference hot loop.

The reference renders sample-by-sample, voice-by-voice on one CPU thread
(synth() — reference: synth.c:502-630).  Here all 64 voices advance in
lockstep as vectors: the outer ``lax.scan`` walks render blocks (the
offline analog of the 512-frame audio callback), the inner ``lax.scan``
walks samples within a block carrying the true per-sample recurrences
(oscillator phase, biquad delay line, amp/volume smoothers, sample&hold,
previous-sample modulation taps).  Everything else — envelopes, mixing,
panning — is pure per-sample math.

Serial in-frame modulation order (synth.c:526 processes voices in index
order, so a voice reading a *lower-indexed* modulator sees its
current-sample value while a higher-indexed one is a one-sample delay) is
reproduced by fixed-point iteration: ``mod_passes`` passes per sample,
where pass p resolves chains of depth < p.  The pass count is computed
from the modulation graph at compile time (host/timeline.py); 1 for the
common all-feedback-free case.

Numerics: float32 throughout, matching the C engine; the LCG noise
stream, truncating table lookup, fast_pow bit trick (synth.c:140-147),
and fmodf wrapping are replicated exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

# exact-fma compat mode needs real f64 (see _fma below)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from skred_tpu import config as C
from skred_tpu.host.timeline import Timeline, noise_stream

V = C.VOICE_MAX
F32 = jnp.float32
I32 = jnp.int32

VOICE_IDX = np.arange(V, dtype=np.int32)

# Exact-fma compat mode: the reference binary (gcc -O3 -march=native)
# contracts specific multiply-adds into fma/fnma instructions; XLA's
# contraction choices inside the fused scan body differ unpredictably.
# For bit-parity we emulate those exact fused ops in f64 (product exact,
# single rounding to f32) at the recurrence-critical sites: the biquad
# chain, the amp/volume smoothers and the FM phase-increment.  `exact` is
# threaded statically so the fast TPU path uses plain hardware arithmetic.
def _fma(a, b, c, exact):
    if not exact:
        return a * b + c
    # Correctly-rounded f32 fma via f64 with round-to-odd (Boldo-Melquiond):
    # the f32×f32 product is exact in f64; the f64 add rounds once, and we
    # patch its result to round-to-odd using the TwoSum error term so the
    # final f64→f32 conversion cannot double-round.
    f64 = jnp.float64
    a64 = jnp.asarray(a).astype(f64)
    b64 = jnp.asarray(b).astype(f64)
    c64 = jnp.asarray(c).astype(f64)
    s = a64 * b64                       # exact
    t = s + c64                         # RN
    bv = t - s
    e = (s - (t - bv)) + (c64 - bv)     # TwoSum residual
    ti = jax.lax.bitcast_convert_type(t, jnp.int64)
    need = (e != 0.0) & ((ti & 1) == 0)
    up = (e > 0.0) != (t < 0.0)
    adj = jnp.where(up, ti + 1, ti - 1)
    t2 = jax.lax.bitcast_convert_type(jnp.where(need, adj, ti), f64)
    return t2.astype(F32)


def _fma32(a, b, c):
    """Correctly-rounded f32 fma in pure f32 (+ i32 bitcast) arithmetic.

    The f64 `_fma` above cannot run on TPU (XLA's x64 rewriter has no
    s64 bitcast-convert), and the remote compile service pins
    --xla_allow_excess_precision=true so hardware contraction can't be
    controlled.  This version needs only f32: Veltkamp split → Dekker
    exact product (a*b = p + e), TwoSum (p + c = s + err), then the
    residual err + e is rounded to odd so the final `s + t` add cannot
    double-round (Boldo-Melquiond).  Verified exact against the f64
    oracle on 400k random/cancellation cases, identically on CPU XLA,
    TPU XLA (elementwise and scan-body) and Mosaic."""
    C = F32(4097.0)                      # 2^12 + 1
    g = a * C
    ah = g - (g - a)
    al = a - ah
    g = b * C
    bh = g - (g - b)
    bl = b - bh
    p = a * b
    # barrier: XLA TPU may contract `p + c` into an fma inside large
    # fusions (the compile service pins --xla_allow_excess_precision=true),
    # which would break the TwoSum below
    p = jax.lax.optimization_barrier(p)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl   # a*b = p + e exactly
    s = p + c
    bv = s - p
    err = (p - (s - bv)) + (c - bv)      # p + c = s + err exactly
    t = err + e
    bv2 = t - err
    r = (err - (t - bv2)) + (e - bv2)    # err + e = t + r exactly
    ti = jax.lax.bitcast_convert_type(t, I32)
    need = (r != 0.0) & ((ti & 1) == 0) & jnp.isfinite(t)
    up = (r > 0.0) != (t < 0.0)
    adj = jnp.where(up, ti + 1, ti - 1)
    t = jnp.where(need, jax.lax.bitcast_convert_type(adj.astype(I32), F32), t)
    return s + t


def _div32(x, y):
    """Correctly-rounded f32 division on every backend.

    TPU's native f32 divide (reciprocal + Newton) is 1 ulp off for ~35% of
    operands; chaotic FM feedback amplifies those ulps into full phase
    decorrelation within seconds.  Dividing in f64 and casting back is
    exactly the correctly-rounded f32 quotient (53 >= 2*24+2 bits makes the
    double rounding safe), matches glibc/x86 `/` bit-for-bit, and costs the
    same as f32 divide on TPU."""
    return (jnp.asarray(x).astype(jnp.float64)
            / jnp.asarray(y).astype(jnp.float64)).astype(F32)




def _sep(x):
    """Keep a product separately rounded: XLA TPU contracts mul+add/sub
    into fma inside large fusions (excess precision is pinned on by the
    compile service); the reference rounds these sites separately, and a
    1-ulp difference in e.g. the CZ phasor index crosses integer
    boundaries (off-by-one table reads)."""
    return jax.lax.optimization_barrier(x)

def _fast_pow(a, b):
    """synth.c:140-147 — bit-trick pow approximation, bit-exact (the
    reference binary contracts the multiply-add into an fma)."""
    i = jax.lax.bitcast_convert_type(a, I32)
    x = _fma32(b, (i - 1065353216).astype(F32), F32(1065353216))
    ii = x.astype(I32)
    r = jax.lax.bitcast_convert_type(ii, F32)
    return jnp.where(a <= 0.0, F32(0.0), r)


def _cz_phasor(mode, p, d, table_size_f):
    """synth.c:149-215 — Casio-CZ phase distortion, 7 modes, vectorized."""
    phase = _div32(p, table_size_f)
    d = jnp.clip(d, 0.0, 0.999)
    half = F32(0.5)
    one = F32(1.0)
    # mode 1: saw -> pulse
    # gcc -O3 -march=native contracts every one of these multiply-adds
    # into fma/fnma — reproduce that single rounding explicitly
    m1 = jnp.where(phase < d, phase * _div32(half, d),
                   _fma32(phase - d, _div32(half, one - d), half))
    # mode 2: square (folded sine)
    sc2 = _div32(half, half - d * half)
    m2 = jnp.where(phase < half, phase * sc2,
                   _fma32(-(one - phase), sc2, one))
    # mode 3: triangle
    m3 = jnp.where(phase < half, phase * sc2,
                   _fma32(phase - half, sc2, half))
    # mode 4: double sine
    m4 = jnp.fmod(phase * F32(2.0), one)
    # mode 5: saw -> triangle
    sc5b = _div32(half, half + d * half)
    m5 = jnp.where(phase < half, phase * sc2,
                   _fma32(phase - half, sc5b, half))
    # modes 6/7: resonant
    m6 = _fast_pow(phase, one + F32(4.0) * d)
    m7 = _fast_pow(phase, one + F32(8.0) * d)
    out = jnp.select(
        [mode == 1, mode == 2, mode == 3, mode == 4, mode == 5, mode == 6, mode == 7],
        [m1, m2, m3, m4, m5, m6, m7],
        default=phase,   # unknown mode returns the raw phase (synth.c:210-211)
    )
    return out * table_size_f


def _envelope(count, p):
    """amp_envelope_step closed form (synth.c:398-431), f32."""
    t = (count - p["env_start"]).astype(F32)
    att = p["env_attack"]
    dec = p["env_decay"]
    sus = p["env_sustain"]
    rel = p["env_release"]
    attack_val = _div32(t, att)
    decay_val = _fma32(-_div32(t - att, dec), F32(1.0) - sus, F32(1.0))
    tr = (count - p["env_rel_at"]).astype(F32)
    release_val = sus * (F32(1.0) - _div32(tr, rel))
    v = jnp.where(
        t < att, attack_val,
        jnp.where(t < att + dec, decay_val,
                  jnp.where(p["env_rel_at"] == 0, sus,
                            jnp.where(tr < rel, release_val, F32(0.0)))))
    return jnp.where(p["env_active"] != 0, v, F32(0.0))


def _voice_pass(est, prev, carry, p, whiteish, count, table_buffer, exact=True):
    """One fixed-point pass of the per-sample voice computation.

    ``est`` — current-sample estimates (for lower-indexed modulator reads),
    ``prev`` — previous-sample final values.  Returns (final_samples,
    new_state dict)."""
    n_idx = VOICE_IDX
    phase, finished = carry["phase"], carry["finished"]
    active = (finished == 0) & (p["amp"] != 0.0)

    def read(osc):
        """sample[osc] with the serial-order rule: current if osc < n."""
        safe = jnp.maximum(osc, 0)
        return jnp.where(osc < n_idx, est[safe], prev[safe])

    # ---- oscillator (synth.c:543-558, osc_next :217-275) ----
    fm = p["freq_mod_osc"]
    g = read(fm) * p["freq_mod_depth"]
    mod_inc = p["phase_inc"][jnp.maximum(fm, 0)]
    inc = jnp.where((fm >= 0) & (fm != n_idx),
                    _fma(mod_inc * p["freq_scale"], g, p["phase_inc"], exact),
                    p["phase_inc"])
    inc = jnp.where(p["direction"] != 0, -inc, inc)
    ph = phase + inc
    bad = ~jnp.isfinite(ph)
    tsize_f = p["table_size"].astype(F32)
    use_loop = (p["loop_enabled"] != 0) & (p["loop_valid"] != 0)
    lo = jnp.where(use_loop, p["loop_start_f"], F32(0.0))
    hi = jnp.where(use_loop, p["loop_end_f"], tsize_f)
    L = hi - lo
    os_noloop = (p["one_shot"] != 0) & (p["loop_enabled"] == 0)
    over = ph >= hi
    under = ph < lo
    wrap_over = lo + jnp.fmod(ph - lo, L)
    wrap_under = hi - jnp.fmod(lo - ph, L)
    ph2 = jnp.where(over, jnp.where(os_noloop, hi - F32(1e-6), wrap_over),
                    jnp.where(under, jnp.where(os_noloop, lo, wrap_under), ph))
    ph2 = jnp.where(bad, F32(0.0), ph2)
    fin_osc = (bad & (p["one_shot"] != 0)) | ((over | under) & os_noloop)

    cm = p["cz_mod_osc"]
    dm = jnp.where(cm >= 0, read(cm) * p["cz_mod_depth"], F32(1.0))
    cz_idx = _cz_phasor(p["cz_mode"], ph2, p["cz_distortion"] + dm, tsize_f)
    idx_f = jnp.where(p["cz_mode"] != 0, cz_idx, ph2)
    idx = jnp.clip(idx_f.astype(I32), 0, jnp.maximum(p["table_size"] - 1, 0))
    f_osc = table_buffer[p["table_off"] + idx]
    f_osc = jnp.where(bad, F32(0.0), f_osc)

    is_noise = p["table_index"] == C.WAVE_TABLE_NOISE_ALT
    f = jnp.where(is_noise, whiteish, f_osc)
    new_phase = jnp.where(active & ~is_noise, ph2, phase)
    new_finished = jnp.where(active & ~is_noise & fin_osc, 1, finished)

    # ---- sample & hold (synth.c:560-571) ----
    hold_on = p["hold_max"] != 0
    hv = jnp.where(hold_on & (carry["hold_count"] == 0), f, carry["hold_val"])
    s1 = jnp.where(hold_on, hv, f)
    hc = carry["hold_count"] + 1
    new_hold_count = jnp.where(active & hold_on,
                               jnp.where(hc >= p["hold_max"], 0, hc),
                               carry["hold_count"])
    new_hold_val = jnp.where(active, hv, carry["hold_val"])

    # ---- bit quantizer (synth.c:341-345, :574) ----
    levels = (jnp.left_shift(jnp.int32(1), p["quantize"]) - 1).astype(F32)
    iv = _fma32(s1, levels, F32(0.5)).astype(I32).astype(F32)
    s2 = jnp.where(p["quantize"] != 0, iv * _div32(F32(1.0), levels), s1)

    # ---- biquad, direct form I state (mmf_process, synth.c:349-364) ----
    # Bit-matching the reference binary's mmf_process codegen (gcc -O3
    # -march=native, verified by disassembly): the separately-rounded
    # product is b1*x1; everything else is an fma/fnma chain:
    #   m = b1*x1; fma(b0,in,m); fma(b2,x2,·); fnma(a1,y1,·); fnma(a2,y2,·)
    # (feedback coefficients are negated host-side — exact — so fnma = fma)
    x1, x2, y1, y2 = carry["x1"], carry["x2"], carry["y1"], carry["y2"]
    flt = p["b1"] * x1
    flt = _fma(p["b0"], s2, flt, exact)
    flt = _fma(p["b2"], x2, flt, exact)
    flt = _fma(p["na1"], y1, flt, exact)
    flt = _fma(p["na2"], y2, flt, exact)
    use_flt = p["filter_mode"] != 0
    s3 = jnp.where(use_flt, flt, s2)
    upd = active & use_flt
    new_x2 = jnp.where(upd, x1, x2)
    new_x1 = jnp.where(upd, s2, x1)
    new_y2 = jnp.where(upd, y1, y2)
    new_y1 = jnp.where(upd, flt, y1)

    # ---- amp / envelope / amp-mod / smoother (synth.c:580-593) ----
    env = jnp.where(p["use_amp_envelope"] != 0,
                    _envelope(count, p) * p["env_velocity"], F32(1.0))
    am = p["amp_mod_osc"]
    am_read = jnp.where(am == n_idx, s3, read(am))
    ampmod = jnp.where(am >= 0, am_read * p["amp_mod_depth"], F32(1.0))
    final = p["amp"] * env * ampmod
    sg = _fma(p["smoother_smoothing"], final - carry["smoother"],
              carry["smoother"], exact)
    use_sm = p["smoother_enable"] != 0
    final2 = jnp.where(use_sm, sg, final)
    new_smoother = jnp.where(active & use_sm, sg, carry["smoother"])
    own = s3 * final2

    sample_out = jnp.where(active, own, F32(0.0))

    # ---- pan (+pan-mod) (synth.c:595-612) ----
    pm = p["pan_mod_osc"]
    pm_read = jnp.where(pm == n_idx, sample_out, read(pm))
    pan_mod_on = (pm >= 0) & (p["disconnect"] == 0)
    # gcc fuses the q product into both (1−q) and (1+q): vfnmadd/vfmadd
    # (observed in the reference binary's synth() codegen)
    one_m_q = _fma(-pm_read, p["pan_mod_depth"], F32(1.0), exact)
    one_p_q = _fma(pm_read, p["pan_mod_depth"], F32(1.0), exact)
    pl = jnp.where(pan_mod_on, one_m_q / F32(2.0), carry["pan_l"])
    pr = jnp.where(pan_mod_on, one_p_q / F32(2.0), carry["pan_r"])
    new_pan_l = jnp.where(active & pan_mod_on, pl, carry["pan_l"])
    new_pan_r = jnp.where(active & pan_mod_on, pr, carry["pan_r"])

    contrib = active & (p["disconnect"] == 0)
    left = jnp.where(contrib, sample_out * pl, F32(0.0))
    right = jnp.where(contrib, sample_out * pr, F32(0.0))

    state = dict(phase=new_phase, finished=new_finished,
                 hold_count=new_hold_count, hold_val=new_hold_val,
                 x1=new_x1, x2=new_x2, y1=new_y1, y2=new_y2,
                 smoother=new_smoother, pan_l=new_pan_l, pan_r=new_pan_r)
    return sample_out, left, right, state


def _sample_step(carry, xs, p, table_buffer, mod_passes, capture, exact):
    whiteish, count = xs
    prev = carry["sample"]
    est = prev
    for _ in range(mod_passes):
        sample_out, left, right, state = _voice_pass(
            est, prev, carry, p, whiteish, count, table_buffer, exact)
        est = sample_out
    new_carry = dict(carry)
    new_carry.update(state)
    new_carry["sample"] = sample_out

    # ---- master volume smoother + stereo mix (synth.c:616-624) ----
    vg = _fma(F32(0.002), p["volume_final"] - carry["vol_gain"],
              carry["vol_gain"], exact)
    new_carry["vol_gain"] = vg
    out_l = jnp.sum(left) * vg
    out_r = jnp.sum(right) * vg
    if capture:
        return new_carry, (out_l, out_r, left, right)
    return new_carry, (out_l, out_r)


def _apply_ops(carry, ops, apply_flag):
    """Apply device-state writes at a segment's first block
    (host ops: trigger/reset phase, finished, filter clear, …)."""
    c = dict(carry)
    def w(cond, new, old):
        return jnp.where(apply_flag & cond, new, old)
    c["phase"] = w(ops["set_phase"], ops["phase"], carry["phase"])
    c["finished"] = w(ops["set_finished"], ops["finished"], carry["finished"])
    c["sample"] = w(ops["set_sample"], ops["sample"], carry["sample"])
    for k in ("x1", "x2", "y1", "y2"):
        c[k] = w(ops["clear_filter"], F32(0.0), carry[k])
    c["smoother"] = w(ops["set_smoother"], ops["smoother"], carry["smoother"])
    c["pan_l"] = w(ops["set_pan"], ops["pan_left"], carry["pan_l"])
    c["pan_r"] = w(ops["set_pan"], ops["pan_right"], carry["pan_r"])
    src = jnp.maximum(ops["copy_hold_from"], 0)
    do_copy = apply_flag & (ops["copy_hold_from"] >= 0)
    c["hold_count"] = jnp.where(do_copy, carry["hold_count"][src], c["hold_count"])
    c["hold_val"] = jnp.where(do_copy, carry["hold_val"][src], c["hold_val"])
    return c


def _render_core(params, ops, seg_of_block, seg_is_start, table_buffer, noise,
                 num_blocks, block, mod_passes, capture, exact=True):
    table_buffer = jnp.asarray(table_buffer)   # indexable by traced values
    carry0 = dict(
        phase=jnp.zeros(V, F32), finished=jnp.zeros(V, I32),
        sample=jnp.zeros(V, F32), hold_count=jnp.zeros(V, I32),
        hold_val=jnp.zeros(V, F32),
        x1=jnp.zeros(V, F32), x2=jnp.zeros(V, F32),
        y1=jnp.zeros(V, F32), y2=jnp.zeros(V, F32),
        smoother=jnp.zeros(V, F32), pan_l=jnp.zeros(V, F32),
        pan_r=jnp.zeros(V, F32), vol_gain=F32(0.0),
    )

    def block_step(carry, k):
        seg = seg_of_block[k]
        p = {name: arr[seg] for name, arr in params.items()}
        o = {name: arr[seg] for name, arr in ops.items()}
        carry = _apply_ops(carry, o, seg_is_start[k])
        counts = (k * block + 1 + jnp.arange(block)).astype(I32)
        nblock = jax.lax.dynamic_slice_in_dim(noise, k * block, block)
        carry, ys = jax.lax.scan(
            lambda c, xs: _sample_step(c, xs, p, table_buffer, mod_passes,
                                       capture, exact),
            carry, (nblock, counts))
        if capture:
            l, r, vl, vr = ys
            return carry, (jnp.stack([l, r], axis=-1), jnp.stack([vl, vr], axis=-1))
        l, r = ys
        return carry, jnp.stack([l, r], axis=-1)

    carry, outs = jax.lax.scan(block_step, carry0, jnp.arange(num_blocks))
    return outs


_render_jit = jax.jit(
    _render_core,
    static_argnames=("num_blocks", "block", "mod_passes", "capture", "exact"),
)

# batch over scripts: params/ops/segment maps are per-script; the packed
# table buffer and the noise stream are shared (noise is the same LCG
# stream for every script — synth.c:508 seeds once per process)
@functools.partial(jax.jit,
                   static_argnames=("num_blocks", "block", "mod_passes",
                                    "capture", "exact"))
def _render_batch_jit(params, ops, seg_of_block, seg_is_start, table_buffer,
                      noise, num_blocks, block, mod_passes, capture,
                      exact=False):
    f = functools.partial(_render_core, num_blocks=num_blocks, block=block,
                          mod_passes=mod_passes, capture=capture, exact=exact)
    return jax.vmap(f, in_axes=(0, 0, 0, 0, None, None))(
        params, ops, seg_of_block, seg_is_start, table_buffer, noise)


def render_timeline(tl: Timeline, capture: bool = False,
                    noise: Optional[np.ndarray] = None,
                    exact: Optional[bool] = None):
    """Render a compiled Timeline → stereo f32 [T, 2] (and optionally the
    per-voice capture [T, V, 2] — the one_skred_frame analog,
    skred.c:88)."""
    if tl.num_blocks == 0:
        z = np.zeros((0, 2), np.float32)
        return (z, np.zeros((0, V, 2), np.float32)) if capture else z
    total = tl.num_blocks * tl.block
    if noise is None:
        noise = noise_stream(total)
    params = {k: jnp.asarray(v) for k, v in tl.params.items()}
    # resolve table keys to packed-buffer offsets
    params["table_off"] = jnp.asarray(
        tl.table_offsets[tl.params["table_key"]], dtype=np.int32)
    for old, new in (("flt_b0", "b0"), ("flt_b1", "b1"), ("flt_b2", "b2"),
                     ("flt_a1", "na1"), ("flt_a2", "na2")):
        a = params.pop(old)
        params[new] = -a if new.startswith("na") else a
    ops = {k: jnp.asarray(v) for k, v in tl.ops.items()}
    if exact is None:
        # exact-fma compat needs f64: default on where it is native
        exact = jax.default_backend() == "cpu"
    outs = _render_jit(
        params, ops,
        jnp.asarray(tl.seg_of_block), jnp.asarray(tl.seg_is_start),
        jnp.asarray(tl.table_buffer), jnp.asarray(noise),
        num_blocks=tl.num_blocks, block=tl.block,
        mod_passes=tl.mod_passes, capture=capture, exact=exact)
    if capture:
        out, cap = outs
        return (np.asarray(out).reshape(total, 2),
                np.asarray(cap).reshape(total, V, 2))
    return np.asarray(outs).reshape(total, 2)
