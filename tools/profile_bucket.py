#!/usr/bin/env python3
"""Ablation profiler for one bench bucket: times the fused engine with
pieces toggled to locate the TPU bottleneck (serial kernels vs XLA glue
vs exact-fma cost vs table-lookup tier).

Usage: python tools/profile_bucket.py [vp] [passes] [rows] [seconds]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

REF = pathlib.Path("/root/reference")
VP = int(sys.argv[1]) if len(sys.argv) > 1 else 2
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 1
ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
SECONDS = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine.fused import render_fused_stream_device
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import (pack_stacked, pad_segments_pow2,
        stack_timelines)

    bank = WaveBank()
    scripts = sorted(REF.glob("*.sk"))
    group = []
    names = []
    for p in scripts:
        tl = compile_script(p.read_text().splitlines(), SECONDS, bank=bank,
                            script_dir=REF)
        if tl.fused_passes is None:
            continue
        st1 = pack_stacked(stack_timelines([tl]))
        vp = st1.params["amp"].shape[-1]
        if vp == VP and tl.fused_passes == PASSES:
            group.append(tl)
            names.append(p.name)
    if not group:
        print("no scripts in this bucket")
        return
    print(f"bucket ({VP},{PASSES}): {names}")
    reps = -(-ROWS // len(group))
    group = group * reps

    st = pack_stacked(stack_timelines(group))
    st = pad_segments_pow2(st)
    print(f"batch={st.batch} n_src={st.n_src} segs={st.params['amp'].shape[1]} "
          f"tables={st.table_buffer.size} "
          f"med={'med_map' in st.params} big={'big_map' in st.params}")

    CHUNK = 172
    audio = st.batch * (st.num_blocks // CHUNK) * CHUNK * st.block / 44100.0

    def run(label, **kw):
        render_fused_stream_device(st, CHUNK, warmup_only=True, **kw)
        t0 = time.time()
        render_fused_stream_device(st, CHUNK, **kw)
        wall = time.time() - t0
        print(f"{label:30s} wall={wall:7.3f}s  x_rt={audio/wall:8.1f}")
        return wall

    run("full (exact, pallas)")
    run("exact=False", exact=False)
    run("use_pallas=False", use_pallas=False)
    run("exact=False pallas=False", exact=False, use_pallas=False)


if __name__ == "__main__":
    main()
