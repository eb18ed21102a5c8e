#!/usr/bin/env python3
"""Benchmark: batched ×-realtime render throughput per chip.

Renders the bundled .sk corpus with the fused block-parallel engine
(Pallas recurrence kernels + voice packing), bucketed by packed voice
count so simple scripts don't pay for complex ones.  Baseline = 1.0×
realtime: the reference C engine renders its 64-voice graph at exactly
real time on one CPU thread by design (512-frame callback deadline,
skred.h:12; see BASELINE.md).

Driver-proof output: after EVERY timed bucket the cumulative headline
JSON line is printed with "partial": true and bench_detail.json is
rewritten, so a timeout mid-run still leaves a parseable, honestly-
partial number (round 3 lost its official number to an all-or-nothing
print, BENCH_r03.json rc=124).  The final line drops "partial".

Per-bucket regression gate: if bench_baseline.json exists (the previous
round's bench_detail), each bucket's x_rt is compared against the
matching baseline bucket; drops >10% are RE-MEASURED in the same run
(three extra timed passes) and only listed under "regressions" if the
best of all passes still reproduces the drop — the remote-tunnel device
shows ±10-30% sequence noise on identical code (PERF.md round 4), so an
un-reproduced flag is noise, not evidence.  Every bucket records its
per-pass wall spread so the flags come with their measurement error.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

REF = pathlib.Path("/root/reference")
CORPUS = pathlib.Path(__file__).resolve().parent / "corpus"
_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SECONDS = float(_ARGS[0]) if _ARGS else 10.0
REPLICAS = int(_ARGS[1]) if len(_ARGS) > 1 else 4
# Arithmetic mode.  --fast selects exact=False: plain hardware ops on
# amplitude-only paths, with the phase-critical sites kept exact (see
# kernels.py / PERF.md — a naive all-plain fast mode FAILS on-chip
# corpus parity: biased double-rounding in the FM increment integrates
# linearly into phase drift).  A mode becomes the default only after
# passing the on-chip full-corpus gate at these exact batch shapes
# (tools/tpu_parity.py --bucketed [--fast] all).
FAST = "--fast" in sys.argv[1:]
# compat fallback time cap: the scan-engine bucket (cyclic graphs that
# the fused engine refuses) is bounded so a slow fallback can't eat the
# driver's whole budget; if the warm-up render already exceeds it, its
# wall is used directly (marked timed_cold) instead of a second pass
COMPAT_BUDGET_S = 120.0


def _load_baseline(here: pathlib.Path):
    """Previous round's per-bucket x_rt keyed by (voices, passes, feat,
    rows) — the regression gate's reference points."""
    p = here / "bench_baseline.json"
    if not p.exists():
        return None
    try:
        base = json.loads(p.read_text())
        return {(b["voices"], b.get("passes"), b.get("feat"), b["rows"]):
                b["x_rt"] for b in base["buckets"]}
    except Exception:
        return None


def main() -> None:
    import os

    if os.environ.get("SKRED_MEGA_ABLATE"):
        # ablation stubs make every render invalid (shape-preserving
        # fills) — a stale env var would produce plausible-looking but
        # wrong numbers, so refuse outright rather than warn
        print(json.dumps({"metric": "batched_render_throughput",
                          "value": 0.0, "unit": "x_realtime_per_chip",
                          "vs_baseline": 0.0,
                          "error": "SKRED_MEGA_ABLATE is set: renders "
                                   "would be invalid; unset it to bench"}))
        sys.exit(2)

    import jax

    # persistent compile cache: TPU compiles through the tunnel cost
    # 40-120 s per shape; cached runs skip them entirely
    here = pathlib.Path(__file__).resolve().parent
    cache = here / ".jax_cache"
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine import kernels as _K
    K_LOOKUP_TL = _K.MEGA_LOOKUP_TL
    from skred_tpu.engine.fused import (compute_feat, render_fused_device,
        render_fused_stream_device)
    from skred_tpu.engine.render import _render_jit  # noqa: F401 (compat import)
    from skred_tpu.host.timeline import compile_script, noise_stream
    from skred_tpu.parallel.batch import (bucket_key, fill_bucket,
        pack_stacked, pad_segments_pow2, stack_timelines)

    # reference corpus + the repo's own stress scripts: stress64.sk (the
    # reference's 64-voice design point, its own bucket) and fb1/fb2.sk
    # (cyclic modulation graphs — the compat-scan fallback bucket)
    scripts = sorted(REF.glob("*.sk")) if REF.exists() else []
    scripts += sorted(CORPUS.glob("*.sk")) if CORPUS.exists() else []
    if not scripts:
        print(json.dumps({"metric": "render_throughput", "value": 0.0,
                          "unit": "x_realtime_per_chip", "vs_baseline": 0.0,
                          "error": "no reference scripts found"}))
        return

    bank = WaveBank()

    def compile_one(p):
        # native C++ host compiler (bit-identical to the Python one,
        # asserted by tests/test_native.py); fall back per script
        try:
            from skred_tpu.host.native import compile_script_native

            return compile_script_native(p.read_text().splitlines(), SECONDS,
                                         bank=bank, script_dir=REF)
        except Exception:
            return compile_script(p.read_text().splitlines(), SECONDS,
                                  bank=bank, script_dir=REF)

    tls = [compile_one(p) for p in scripts]

    # bucket by (packed voices, fixed-point passes, static feature set) so
    # each compiled program is specialized to exactly the DSP stages its
    # scripts use — mixing a filter script into a no-filter bucket would
    # put the biquad chain back into everyone's serial kernel
    buckets = {}
    compat_tls = []
    for tl in tls:
        if tl.fused_passes is None:
            compat_tls.append(tl)   # 1-sample feedback loops: scan engine
            continue
        buckets.setdefault(bucket_key(tl), []).append(tl)

    baseline = _load_baseline(here)
    total_audio = 0.0
    total_wall = 0.0
    detail = []
    regressions = []
    checksum = 0.0
    # cyclic scripts render one bucket each; gate-refused ones share the
    # single compat-scan bucket — resolve the split now so the partial
    # lines' buckets_total is the real denominator
    from skred_tpu.engine.cyclic import (ROWS_QUANTUM, cyclic_gate,
                                         render_cyclic_stream_device)

    cyclic_tls, scan_tls = [], []
    for tl in compat_tls:
        stc = pack_stacked(stack_timelines([tl] * ROWS_QUANTUM),
                           cyclic=True)
        reason = cyclic_gate(stc)
        if reason is None:
            cyclic_tls.append(tl)
        else:
            print(f"WARNING: cyclic engine refused a script ({reason}); "
                  f"it will bench on the ~4x compat-scan fallback",
                  file=sys.stderr, flush=True)
            scan_tls.append(tl)
    n_buckets_total = (len(buckets) + len(cyclic_tls)
                       + (1 if scan_tls else 0))
    out_path = here / "bench_detail.json"

    def emit(partial: bool) -> None:
        """Cumulative headline + detail file — called after EVERY bucket
        so a timeout still records the completed prefix."""
        x_rt = total_audio / total_wall if total_wall else 0.0
        # slowest over every Pallas-engine bucket (fused tiers + cyclic);
        # only the compat-scan fallback is excluded
        slowest = min((b for b in detail
                       if isinstance(b["voices"], int)
                       or str(b["voices"]).startswith("cyclic")),
                      key=lambda b: b["x_rt"], default=None)
        headline = {
            "metric": "batched_render_throughput",
            "value": round(x_rt, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(x_rt, 2),
            "buckets": len(detail),
            "slowest_bucket_x_rt": slowest["x_rt"] if slowest else None,
            "distinct_scripts": len(scripts),
            "total_audio_s": round(total_audio, 1),
            "total_wall_s": round(total_wall, 3),
            "arith": "fast" if FAST else "exact",
        }
        if partial:
            headline["partial"] = True
            headline["buckets_total"] = n_buckets_total
        if regressions:
            headline["regressions"] = len(regressions)
        out_path.write_text(json.dumps({
            **headline,
            "replicas": REPLICAS,
            "seconds_each": SECONDS,
            "chunk_blocks": CHUNK,
            # renders stay bit-exact at any lookup chunk length, but a
            # stale probe env var would skew perf — record non-defaults
            **({"lookup_tl": K_LOOKUP_TL} if K_LOOKUP_TL != 64 else {}),
            "note": "audio credited per whole CHUNK-block chunk only; "
                    "rows = replicated batch size, distinct_scripts = "
                    "unique corpus scripts in the bucket",
            "buckets": detail,
            "regression_list": regressions,
            "checksum": checksum,
        }, indent=1))
        print(json.dumps(headline), flush=True)

    CHUNK = 172   # ~2s of blocks: compiled shapes independent of duration

    def timed(fn, passes=2):
        """best-of-N timed passes; returns (walls list, checksum).
        Renders are deterministic, so every pass must return the same
        checksum — asserted so the guard covers the timed runs."""
        walls, cs = [], None
        for _ in range(passes):
            t0 = time.time()
            cs2 = fn()
            walls.append(time.time() - t0)
            assert cs is None or cs == cs2, \
                f"nondeterministic render: {cs} != {cs2}"
            cs = cs2
        return walls, cs

    def gate(entry, key, run_more):
        """Regression gate with in-run reproduction: a >10% drop vs the
        baseline re-times the bucket (3 more passes, same run) and is
        reported only if the best of ALL passes still reproduces it."""
        prev = baseline.get(key) if baseline is not None else None
        if not prev:
            return entry["wall_s"]
        delta = entry["x_rt"] / prev - 1.0
        entry["x_rt_prev"] = prev
        entry["delta_vs_baseline"] = round(delta, 3)
        if delta < -0.10:
            wall = run_more(3)
            x_rt2 = round(entry["x_rt"] * entry["wall_s"] / wall, 1)
            delta = x_rt2 / prev - 1.0
            entry["x_rt"] = x_rt2
            entry["wall_s"] = round(wall, 3)
            entry["delta_vs_baseline"] = round(delta, 3)
            if delta < -0.10:
                regressions.append({"bucket": key, "x_rt": x_rt2,
                                    "prev": prev, "delta": round(delta, 3),
                                    "reproduced_over_passes":
                                        entry["timed_passes"]})
                print(f"REGRESSION (reproduced x{entry['timed_passes']}) "
                      f"{key} {prev} -> {x_rt2} ({delta:+.1%})",
                      file=sys.stderr, flush=True)
            else:
                print(f"noise: flagged drop did not reproduce {key} "
                      f"best {x_rt2} vs prev {prev}",
                      file=sys.stderr, flush=True)
        return entry["wall_s"]

    for (vp, passes, _fkey), group in sorted(buckets.items()):
        n_distinct = len(group)
        # fill each bucket to a batch that amortizes per-block overheads
        # (the per-block fixed cost dominates light buckets: 0.sk-class
        # scripts nearly double their throughput from 256 to 1024 rows)
        group = fill_bucket(group, vp, REPLICAS)
        st = pack_stacked(stack_timelines(group))
        # fill (don't silently pad) up to the Pallas lane quantum: the
        # device renders the padded batch either way — e.g. a (10,1)-tier
        # bucket pads 256 -> 512 rows — so credit rows that are real work
        from skred_tpu.engine.fused import _pad_quantum

        per = _pad_quantum(st, st.params["amp"].shape[-1])
        pad_b = (-len(group)) % max(per, 1)
        if pad_b:
            group = group + [group[-1]] * pad_b
            st = pack_stacked(stack_timelines(group))
        st = pad_segments_pow2(st)
        exact_arg = False if FAST else None
        render_fused_stream_device(st, CHUNK, warmup_only=True,
                                   exact=exact_arg)  # compile
        # best-of-2: the remote-tunnel device occasionally stalls mid-run;
        # a second timed pass costs seconds and removes multi-x noise
        walls, cs = timed(lambda: render_fused_stream_device(
            st, CHUNK, exact=exact_arg))
        wall = min(walls)
        checksum += cs
        # only whole CHUNK-block chunks are rendered (and therefore
        # credited): audio below counts exactly what ran on the device
        whole_chunks = st.num_blocks // CHUNK
        audio = st.batch * whole_chunks * CHUNK * st.block / 44100.0
        total_audio += audio
        # derive the recorded feature set from the stacked batch (equal
        # to the key's Feat; avoids trusting the memoized key)
        feat = compute_feat(st)
        fstr = ",".join(k if v is True else f"{k}={list(v)}"
                        for k, v in feat._asdict().items() if v)
        # analytic roofline attribution: achieved bytes/s and FLOP/s vs
        # chip peaks, naming the bound resource (estimate — see
        # skred_tpu/parallel/roofline.py)
        from skred_tpu.parallel.roofline import estimate_bucket

        roof = estimate_bucket(st).roofline(wall, whole_chunks * CHUNK)
        entry = {"voices": int(vp), "passes": int(passes),
                 "feat": fstr, "rows": len(group),
                 "distinct_scripts": n_distinct,
                 "wall_s": round(wall, 3),
                 "x_rt": round(audio / wall, 1),
                 "wall_spread": [round(min(walls), 3), round(max(walls), 3)],
                 "timed_passes": len(walls),
                 "roofline": roof}

        def run_more(n, walls=walls, st=st, entry=entry):
            more, _ = timed(lambda: render_fused_stream_device(
                st, CHUNK, exact=exact_arg), passes=n)
            walls.extend(more)
            entry["wall_spread"] = [round(min(walls), 3),
                                    round(max(walls), 3)]
            entry["timed_passes"] = len(walls)
            return min(walls)

        wall = gate(entry, (entry["voices"], entry["passes"],
                            entry["feat"], entry["rows"]), run_more)
        total_wall += wall
        detail.append(entry)
        emit(partial=True)
    for tl in cyclic_tls:
        # cyclic modulation graphs: the per-frame serial Pallas engine
        # (engine/cyclic.py), one bucket per script identity so every
        # voice's table window is row-uniform; scripts the eligibility
        # gate refuses stay on the compat scan fallback below
        st = pack_stacked(stack_timelines([tl] * ROWS_QUANTUM),
                          cyclic=True)
        k = st.params["amp"].shape[-1]
        render_cyclic_stream_device(st, CHUNK, warmup_only=True)
        walls, cs = timed(lambda: render_cyclic_stream_device(st, CHUNK))
        wall = min(walls)
        checksum += cs
        whole_chunks = st.num_blocks // CHUNK
        audio = st.batch * whole_chunks * CHUNK * st.block / 44100.0
        total_audio += audio
        entry = {"voices": f"cyclic-{k}v", "rows": st.batch,
                 "distinct_scripts": 1,
                 "wall_s": round(wall, 3),
                 "x_rt": round(audio / wall, 1),
                 "wall_spread": [round(min(walls), 3), round(max(walls), 3)],
                 "timed_passes": len(walls)}

        def run_more_c(n, walls=walls, st=st, entry=entry):
            more, _ = timed(lambda: render_cyclic_stream_device(st, CHUNK),
                            passes=n)
            walls.extend(more)
            entry["wall_spread"] = [round(min(walls), 3),
                                    round(max(walls), 3)]
            entry["timed_passes"] = len(walls)
            return min(walls)

        wall = gate(entry, (entry["voices"], None, None, entry["rows"]),
                    run_more_c)
        total_wall += wall
        detail.append(entry)
        emit(partial=True)
    compat_tls = scan_tls
    if compat_tls:
        from skred_tpu.parallel.batch import render_stacked

        noise = noise_stream(compat_tls[0].num_blocks * compat_tls[0].block)
        group = compat_tls * REPLICAS
        st = stack_timelines(group)
        t0 = time.time()
        out = render_stacked(st, noise=noise)       # compile + warm pass
        warm_wall = time.time() - t0
        timed_cold = warm_wall > COMPAT_BUDGET_S
        if timed_cold:
            wall = warm_wall   # budget spent: credit the pass that ran
        else:
            t0 = time.time()
            out = render_stacked(st, noise=noise)
            wall = time.time() - t0
        checksum += float(np.abs(out[-1]).sum())
        audio = st.batch * st.num_blocks * st.block / 44100.0
        total_audio += audio
        total_wall += wall
        detail.append({"voices": "compat-scan", "rows": len(group),
                       "distinct_scripts": len(compat_tls),
                       "wall_s": round(wall, 3),
                       "timed_cold": timed_cold,
                       "x_rt": round(audio / wall, 1)})
        emit(partial=True)

    # headline: the LAST line is the final (non-partial) cumulative JSON;
    # the driver keeps the output tail, so earlier partial lines serve as
    # the fallback record if this line is never reached
    emit(partial=False)


if __name__ == "__main__":
    main()
