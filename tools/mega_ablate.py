#!/usr/bin/env python3
"""Attribute one bucket's megakernel time to its internal phases.

Runs tools/one_bucket.py-style timing in subprocesses with
SKRED_MEGA_ABLATE stubbing one phase at a time (renders are invalid in
ablated runs — timing only).  The delta vs the full run attributes wall
time to each phase; stubbing everything leaves the XLA glue + grid/DMA
skeleton.

Usage: python tools/mega_ablate.py [script] [seconds] [exact|fast]
"""

import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
NAME = sys.argv[1] if len(sys.argv) > 1 else "48.sk"
SECONDS = sys.argv[2] if len(sys.argv) > 2 else "10"
MODE = sys.argv[3] if len(sys.argv) > 3 else "exact"

CONFIGS = [
    ("full", ""),
    ("no phase1 (serial walk)", "phase1"),
    ("no phase2 (cz/index)", "phase2"),
    ("no lookup (table DMA)", "lookup"),
    ("no gain (env precompute)", "gain"),
    ("no phase4 (serial filter)", "phase4"),
    ("no mix (stereo acc)", "mix"),
    ("skeleton (all stubbed)", "phase1,phase2,lookup,gain,phase4,mix"),
]


def main() -> None:
    for label, ablate in CONFIGS:
        env = dict(os.environ, SKRED_MEGA_ABLATE=ablate)
        r = subprocess.run(
            [sys.executable, str(HERE / "one_bucket.py"), NAME, SECONDS,
             MODE],
            env=env, capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines() if "x_rt" in l]
        print(f"{label:28s} {line[-1] if line else r.stderr[-200:]}",
              flush=True)


main()
