#!/usr/bin/env python3
"""Time one script's bench bucket (exact + fast) — bisect helper."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF = pathlib.Path("/root/reference")
NAME = sys.argv[1] if len(sys.argv) > 1 else "48.sk"
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
MODES = sys.argv[3].split(",") if len(sys.argv) > 3 else ["exact"]


def main():
    import jax

    cache = pathlib.Path("/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine.fused import (_pad_quantum,
                                        render_fused_stream_device)
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import (bucket_key, fill_bucket,
        pack_stacked, pad_segments_pow2, stack_timelines)

    bank = WaveBank()
    corpus = pathlib.Path(__file__).resolve().parents[1] / "corpus" / NAME
    path = corpus if corpus.exists() else REF / NAME
    tl = compile_script(path.read_text().splitlines(), SECONDS,
                        bank=bank, script_dir=REF)
    k = bucket_key(tl)
    group = fill_bucket([tl], k[0], 4)
    st = pack_stacked(stack_timelines(group))
    per = _pad_quantum(st, st.params["amp"].shape[-1])
    pad_b = (-len(group)) % max(per, 1)
    if pad_b:
        st = pack_stacked(stack_timelines(group + [group[-1]] * pad_b))
    st = pad_segments_pow2(st)
    CHUNK = 172
    audio = st.batch * (st.num_blocks // CHUNK) * CHUNK * st.block / 44100.0
    for mode in MODES:
        ex = None if mode == "exact" else False
        t0 = time.time()
        render_fused_stream_device(st, CHUNK, warmup_only=True, exact=ex)
        tc = time.time() - t0
        wall = float("inf")
        for _ in range(2):
            t0 = time.time()
            render_fused_stream_device(st, CHUNK, exact=ex)
            wall = min(wall, time.time() - t0)
        print(f"{NAME} {mode}: batch {st.batch} tiers {st.tiers} "
              f"compile {tc:.1f}s wall {wall:.3f}s "
              f"x_rt {audio / wall:.1f}", flush=True)


main()
