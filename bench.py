#!/usr/bin/env python3
"""Benchmark: batched ×-realtime render throughput per chip.

Renders the bundled .sk corpus as one batched tensor program (vmap over
scripts, all 64 voices per script) and reports aggregate rendered
audio-seconds per wall-second.  Baseline = 1.0× realtime: the reference C
engine renders 64 voices at exactly real time on one CPU thread by design
(512-frame callback deadline, skred.h:12; see BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

REF = pathlib.Path("/root/reference")
SECONDS = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main() -> None:
    from skred_tpu.assets import WaveBank
    from skred_tpu.host.timeline import compile_script, noise_stream
    from skred_tpu.parallel.batch import render_stacked, stack_timelines

    if REF.exists():
        scripts = sorted(REF.glob("*.sk"))
    else:
        scripts = []
    if not scripts:
        print(json.dumps({"metric": "render_throughput", "value": 0.0,
                          "unit": "x_realtime_per_chip", "vs_baseline": 0.0,
                          "error": "no reference scripts found"}))
        return

    bank = WaveBank()
    tls = []
    for p in scripts:
        tl = compile_script(p.read_text().splitlines(), SECONDS, bank=bank,
                            script_dir=REF)
        tls.append(tl)
    tls = tls * REPLICAS
    st = stack_timelines(tls)
    noise = noise_stream(st.num_blocks * st.block)

    # warmup (compile)
    t0 = time.time()
    out = render_stacked(st, noise=noise)
    compile_and_first = time.time() - t0

    # steady state
    t0 = time.time()
    out = render_stacked(st, noise=noise)
    wall = time.time() - t0

    audio_seconds = st.batch * st.num_blocks * st.block / 44100.0
    x_rt = audio_seconds / wall
    print(json.dumps({
        "metric": "batched_render_throughput",
        "value": round(x_rt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_rt / 1.0, 2),
        "detail": {
            "batch": st.batch,
            "scripts": len(scripts),
            "seconds_each": SECONDS,
            "wall_s": round(wall, 3),
            "compile_plus_first_s": round(compile_and_first, 2),
            "voice_samples_per_s": int(audio_seconds * 64 * 44100 / wall),
            "rms": float(np.sqrt((out.astype(np.float64) ** 2).mean())),
        },
    }))


if __name__ == "__main__":
    main()
