#!/usr/bin/env python3
"""Cost attribution for one bench bucket: re-times the bucket with single
feature flags force-cleared (semantics change — throwaway renders, timing
only) to see what each enabled stage costs on the chip.

Usage: python tools/ablate_feat.py <script.sk> [rows] [seconds]
"""

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

REF = pathlib.Path("/root/reference")
SCRIPT = sys.argv[1] if len(sys.argv) > 1 else "20.sk"
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
SECONDS = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0



def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine import fused as F
    from skred_tpu.host.native import compile_script_native
    from skred_tpu.parallel.batch import (pack_stacked, pad_segments_pow2,
        stack_timelines)

    bank = WaveBank()
    tl = compile_script_native((REF / SCRIPT).read_text().splitlines(),
                               SECONDS, bank=bank, script_dir=REF)
    st = pack_stacked(stack_timelines([tl] * ROWS))
    st = pad_segments_pow2(st)
    feat0 = F.compute_feat(st)
    print(f"{SCRIPT}: vp={st.params['amp'].shape[-1]} "
          f"passes={st.fused_passes} n_src={st.n_src} {feat0}")

    CHUNK = 172
    audio = st.batch * (st.num_blocks // CHUNK) * CHUNK * st.block / 44100.0

    # monkey-patch compute_feat so render picks up the override; restored
    # in the finally below so in-process reuse keeps real feature flags
    orig_compute_feat = F.compute_feat

    def run(label, feat, stx):
        # the override must also serve per-tier calls (lanes kwarg)
        F.compute_feat = lambda _st, lanes=None: feat
        F.render_fused_stream_device(stx, CHUNK, warmup_only=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            F.render_fused_stream_device(stx, CHUNK)
            best = min(best, time.time() - t0)
        print(f"{label:24s} wall={best:7.3f}s  x_rt={audio/best:8.1f}")
        return best

    try:
        base = run("baseline", feat0, st)
        for flag in ("fm", "cz", "am", "pm", "env", "flt", "sm", "hold",
                     "quant", "noise", "finish", "disc"):
            if getattr(feat0, flag):
                f = feat0._replace(**{flag: False})
                w = run(f"-{flag}", f, st)
                print(f"    {flag} costs ~{(base - w) / base * 100:5.1f}%")
        # mod_passes=1 variant: full cost of the fixed-point passes
        if st.fused_passes and st.fused_passes > 1:
            st1 = dataclasses.replace(st, fused_passes=1)
            w = run("passes=1", feat0, st1)
            print(f"    extra passes cost ~{(base - w) / base * 100:.1f}%")
    finally:
        F.compute_feat = orig_compute_feat


if __name__ == "__main__":
    main()
