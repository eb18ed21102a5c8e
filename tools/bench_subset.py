#!/usr/bin/env python3
"""Time ONLY the slow benchmark buckets (the perf frontier) with the
current engine code — the fast iteration loop for heavy-bucket work.

Selects fused buckets by a predicate over (packed voices, passes, feat)
— default: the sub-1000x class (passes == 2, filter on, vp >= 7) — and
times them exactly as bench.py does (same fill, pack, pow2 pad, chunked
device stream, best-of-2).

Usage: python tools/bench_subset.py [seconds] [replicas] [--all]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = pathlib.Path("/root/reference")
args = [a for a in sys.argv[1:] if not a.startswith("--")]
SECONDS = float(args[0]) if args else 10.0
REPLICAS = int(args[1]) if len(args) > 1 else 4
ALL = "--all" in sys.argv
FAST = "--fast" in sys.argv        # exact=False, like bench.py --fast


def main() -> None:
    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine.fused import render_fused_stream_device
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import (bucket_key, fill_bucket,
        pack_stacked, pad_segments_pow2, stack_timelines)

    bank = WaveBank()

    def compile_one(p):
        try:
            from skred_tpu.host.native import compile_script_native

            return compile_script_native(p.read_text().splitlines(), SECONDS,
                                         bank=bank, script_dir=REF)
        except Exception:
            return compile_script(p.read_text().splitlines(), SECONDS,
                                  bank=bank, script_dir=REF)

    buckets = {}
    names = {}
    for p in sorted(REF.glob("*.sk")):
        tl = compile_one(p)
        if tl.fused_passes is None:
            continue
        k = bucket_key(tl)
        buckets.setdefault(k, []).append(tl)
        names.setdefault(k, []).append(p.name)

    def slow(key):
        vp, passes, feat = key
        return ALL or (feat.flt and vp >= 7)

    total_audio = total_wall = 0.0
    CHUNK = 172
    for key, group in sorted(buckets.items()):
        if not slow(key):
            continue
        vp, passes, feat = key
        group = fill_bucket(group, vp, REPLICAS)
        st = pack_stacked(stack_timelines(group))
        from skred_tpu.engine.fused import _pad_quantum

        per = _pad_quantum(st, st.params["amp"].shape[-1])
        pad_b = (-len(group)) % max(per, 1)
        if pad_b:
            group = group + [group[-1]] * pad_b
            st = pack_stacked(stack_timelines(group))
        st = pad_segments_pow2(st)
        exact_arg = False if FAST else None
        t0 = time.time()
        render_fused_stream_device(st, CHUNK, warmup_only=True,
                                   exact=exact_arg)
        t_compile = time.time() - t0
        wall = float("inf")
        for _ in range(2):
            t0 = time.time()
            render_fused_stream_device(st, CHUNK, exact=exact_arg)
            wall = min(wall, time.time() - t0)
        whole = st.num_blocks // CHUNK
        audio = st.batch * whole * CHUNK * st.block / 44100.0
        total_audio += audio
        total_wall += wall
        fstr = ",".join(k_ for k_, v in feat._asdict().items() if v is True)
        from skred_tpu.parallel.roofline import estimate_bucket

        roof = estimate_bucket(st).roofline(wall, whole * CHUNK)
        print(json.dumps({"voices": int(vp), "passes": int(passes),
                          "feat": fstr, "rows": len(group),
                          "scripts": names[key], "tiers": st.tiers,
                          "compile_s": round(t_compile, 1),
                          "wall_s": round(wall, 3),
                          "x_rt": round(audio / wall, 1),
                          "roofline": roof}), flush=True)
    if total_wall:
        print(f"# subset total: {total_audio / total_wall:.1f} x_rt "
              f"({total_wall:.2f}s wall)")


if __name__ == "__main__":
    main()
