#!/usr/bin/env python3
"""Render every bundled .sk via both engines and report max error in dB.

Usage: python tools/parity_sweep.py [seconds] [script ...]
Goldens are minted (and cached) in golden/out/ from the reference C build.
"""

import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from skred_tpu.assets import WaveBank
from skred_tpu.engine import render_timeline
from skred_tpu.host.timeline import compile_script

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")
CORPUS = REPO / "corpus"       # repo-local extension (feedback, stress64)
OUT = REPO / "golden" / "out"


def script_path(script: str) -> pathlib.Path:
    p = CORPUS / script
    return p if p.exists() else REF / script


def mint(script: str, seconds: float, extra=()) -> np.ndarray:
    OUT.mkdir(parents=True, exist_ok=True)
    tag = script.replace(".sk", "") + f"_{seconds:g}" + ("_" + "_".join(extra) if extra else "")
    f = OUT / f"{tag}.f32"
    if not f.exists():
        exe = REPO / "golden" / "build" / "render_golden"
        cmd = [str(exe), "-d", str(seconds), "-o", str(f)]
        for e in extra:
            cmd += ["-e", e]
        cmd.append(str(script_path(script).resolve()))
        subprocess.run(cmd, cwd=REF, check=True, capture_output=True)
    return np.fromfile(f, dtype=np.float32).reshape(-1, 2)


FUSED = "--fused" in sys.argv
if FUSED:
    sys.argv.remove("--fused")
FAST = "--fast" in sys.argv      # fused engine with exact=False (plain
if FAST:                         # mul+add at the gcc-contracted sites)
    sys.argv.remove("--fast")


def run_one(script: str, seconds: float, bank: WaveBank, extra=()):
    golden = mint(script, seconds, extra)
    lines = script_path(script).read_text().splitlines()
    t0 = time.time()
    tl = compile_script(lines, seconds, bank=bank, script_dir=REF)
    if extra:
        # extra commands execute after the script, before rendering
        raise NotImplementedError
    t_compile = time.time() - t0
    t0 = time.time()
    if FUSED and tl.fused_passes is not None:
        from skred_tpu.engine.fused import render_fused
        from skred_tpu.parallel.batch import stack_timelines

        out = render_fused(stack_timelines([tl]),
                           exact=(False if FAST else None))[0]
    else:
        out = render_timeline(tl)
    t_render = time.time() - t0
    n = min(len(out), len(golden))
    err = float(np.abs(out[:n] - golden[:n]).max()) if n else 0.0
    db = 20 * np.log10(err + 1e-30)
    return db, err, t_compile, t_render, tl


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    scripts = sys.argv[2:] or (sorted(p.name for p in REF.glob("*.sk"))
                               + sorted(p.name for p in CORPUS.glob("*.sk")))
    bank = WaveBank()
    worst = []
    for s in scripts:
        try:
            db, err, tc, tr, tl = run_one(s, seconds, bank)
            flag = "OK " if db <= -60 else "FAIL"
            print(f"{flag} {s:10s} {db:8.1f} dB  err={err:.3e} "
                  f"segs={tl.num_segments:4d} K={tl.mod_passes} "
                  f"compile={tc:.2f}s render={tr:.1f}s", flush=True)
            worst.append((db, s))
        except Exception as ex:
            print(f"ERR  {s:10s} {type(ex).__name__}: {ex}", flush=True)
            worst.append((0.0, s))
    worst.sort(reverse=True)
    print("\nworst:", worst[:8])


if __name__ == "__main__":
    main()
