#!/usr/bin/env python3
"""Attribute a heavy bucket's per-block wall time: Pallas kernels vs XLA
glue (transposes, one-hot einsums, envelope, CZ, scan bookkeeping).

Times the real bench bucket for a script with (a) the production
kernels, (b) each kernel class stubbed with a shape-preserving no-op
(the XLA glue around it stays), clearing the jit cache between runs.
The deltas attribute wall time to each kernel; the stub-everything
residue is the glue.

Usage: python tools/gluebench.py [script] [seconds]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

REF = pathlib.Path("/root/reference")
SCRIPT = sys.argv[1] if len(sys.argv) > 1 else "65.sk"
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0


def main():
    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine import fused, kernels as K
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import (bucket_key, fill_bucket,
        pack_stacked, pad_segments_pow2, stack_timelines)

    bank = WaveBank()
    tl = compile_script((REF / SCRIPT).read_text().splitlines(), SECONDS,
                        bank=bank, script_dir=REF)
    k = bucket_key(tl)
    rows = fill_bucket([tl], k[0])
    st = pad_segments_pow2(pack_stacked(stack_timelines(rows)))
    CHUNK = 172
    blocks = (st.num_blocks // CHUNK) * CHUNK
    print(f"{SCRIPT}: batch {st.batch} Vp {k[0]} tiers {st.tiers} "
          f"blocks {blocks}")

    real = dict(phase=K.phase_walk_pallas, fs=K.filt_smooth_pallas,
                lut=K.table_lookup_grouped, lut1=K.table_lookup_pallas)

    def stub_phase(inc, phase0, fin0, lo, hi, L, osn, one_shot, adv, act,
                   fm=True, finish=True, n=None):
        m = inc.shape[-1]
        nn = inc.shape[0] if fm else n
        ph = inc if fm else jnp.broadcast_to(inc[None, :], (nn, m))
        dead = jnp.zeros((nn, m), jnp.int32) if finish else None
        return ph, dead, phase0, (fin0 if finish else None)

    def stub_fs(x, env, amod, alive, b0, b1, b2, na1, na2, use_flt, use_sm,
                amp, smoothing, am_self, am_depth, hold_on, hold_max,
                quant_on, levels, inv_levels, x1, x2, y1, y2, sg, hc, hv,
                exact=False, feat=None):
        return x, x1, x2, y1, y2, sg, hc, hv

    def stub_lut(table3, slot, idx, slot_size=None):
        return idx.astype(jnp.float32)

    def run(label, patch):
        for name, fn in real.items():
            setattr(K, {"phase": "phase_walk_pallas",
                        "fs": "filt_smooth_pallas",
                        "lut": "table_lookup_grouped",
                        "lut1": "table_lookup_pallas"}[name], fn)
        for name, fn in patch.items():
            setattr(K, name, fn)
        fused._fused_chunk_jit.clear_cache()
        fused.render_fused_stream_device(st, CHUNK, warmup_only=True)
        t0 = time.time()
        fused.render_fused_stream_device(st, CHUNK)
        wall = time.time() - t0
        print(f"{label:26s} {wall:7.3f}s  {wall / blocks * 1e3:7.3f} ms/block",
              flush=True)
        return wall

    def stub_tier(table3, slot, cbase, inc, dm, amod, vecs, states,
                  feat=None, exact=False, n=None, mixw=None, b_rows=0,
                  bank=None, srow_fm=None, srow_cz=None, srow_am=None):
        m = slot.shape[0]
        out = inc if (feat[0] and inc is not None) \
            else jnp.broadcast_to(vecs["amp"][None, :], (n, m))
        res = {"phase": states["phase"],
               "cnt": jnp.full((m,), n, jnp.int32)}
        if mixw is not None and b_rows:
            res["out_last"] = out[-1]
            res["acc_l"] = jnp.zeros((n, b_rows * 128), jnp.float32)
            res["acc_r"] = jnp.zeros((n, b_rows * 128), jnp.float32)
        if feat[10]:
            res["finished"] = states["finished"]
        if feat[4]:
            res.update({kk: states[kk] for kk in ("x1", "x2", "y1", "y2")})
        if feat[5]:
            res["smoother"] = states["smoother"]
        if feat[6]:
            res["hold_count"] = states["hold_count"]
            res["hold_val"] = states["hold_val"]
        return out, res

    real["tier"] = K.tier_pallas
    names_map = {"phase": "phase_walk_pallas", "fs": "filt_smooth_pallas",
                 "lut": "table_lookup_grouped", "lut1": "table_lookup_pallas",
                 "tier": "tier_pallas"}
    # rebind run() to the extended map
    def run(label, patch, mega=None):
        for name, fn in real.items():
            setattr(K, names_map[name], fn)
        if mega is not None:
            K.MEGA = mega
        for name, fn in patch.items():
            setattr(K, name, fn)
        fused._fused_chunk_jit.clear_cache()
        fused.render_fused_stream_device(st, CHUNK, warmup_only=True)
        t0 = time.time()
        fused.render_fused_stream_device(st, CHUNK)
        wall = time.time() - t0
        print(f"{label:26s} {wall:7.3f}s  {wall / blocks * 1e3:7.3f} ms/block",
              flush=True)
        return wall

    full = run("full (megakernel)", {}, mega=True)
    tier_glue = run("tier stubbed (glue)", {"tier_pallas": stub_tier},
                    mega=True)
    old = run("3-kernel path (MEGA off)", {}, mega=False)
    no_lut = run("  lut stubbed", {"table_lookup_grouped": stub_lut,
                                   "table_lookup_pallas": stub_lut},
                 mega=False)
    no_fs = run("  fs stubbed", {"filt_smooth_pallas": stub_fs}, mega=False)
    no_ph = run("  phase stubbed", {"phase_walk_pallas": stub_phase},
                mega=False)
    none = run("  all stubbed (glue)", {"table_lookup_grouped": stub_lut,
                                        "table_lookup_pallas": stub_lut,
                                        "filt_smooth_pallas": stub_fs,
                                        "phase_walk_pallas": stub_phase},
               mega=False)
    K.MEGA = True
    print(f"\nmega: kernel {(full-tier_glue)/blocks*1e3:.3f} ms/block, "
          f"glue {tier_glue/blocks*1e3:.3f}  |  old path {old/blocks*1e3:.3f}"
          f" (lut {(old-no_lut)/blocks*1e3:.3f}  "
          f"fs {(old-no_fs)/blocks*1e3:.3f}  "
          f"phase {(old-no_ph)/blocks*1e3:.3f}  "
          f"glue {none/blocks*1e3:.3f})")


if __name__ == "__main__":
    main()
