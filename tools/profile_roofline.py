#!/usr/bin/env python3
"""Validate parallel/roofline.py against a jax.profiler device trace.

Captures an xplane trace of one bucket's steady-state render (same
bucket construction as tools/one_bucket.py), aggregates device-op time
by category, and reconciles:

  * measured device-busy time vs host wall (how much is dispatch gap),
  * per-category op time (tier megakernel / modulator einsum / rest of
    the XLA glue) vs the shares the analytic model implies,
  * XLA's own per-op flops/bytes stats (when present) vs the model's
    bytes_per_block / flops_per_block,
  * a measured per-grid-step overhead to calibrate GRID_STEP_COST.

Writes PROFILE_ROOFLINE.json with the reconciliation table.

Usage: python tools/profile_roofline.py [script,script,...] [seconds]
"""

import collections
import json
import pathlib
import re
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF = pathlib.Path("/root/reference")
SCRIPTS = (sys.argv[1] if len(sys.argv) > 1
           else "72.sk,909.sk,48.sk").split(",")
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

# event-name → category.  Pallas kernels surface as custom-calls with
# the kernel function's name; einsums/fusions carry HLO fusion names.
_CATS = (
    ("tier_kernel", re.compile(r"tier|mega|custom-call", re.I)),
    ("einsum_reads", re.compile(r"dot|einsum|conv", re.I)),
    ("dyn_slice", re.compile(r"dynamic.?(update.?)?slice|gather|scatter",
                             re.I)),
    ("copy_infeed", re.compile(r"copy|infeed|outfeed|transfer", re.I)),
    ("glue", re.compile(r"fusion|reduce|scan|select|broadcast|while",
                        re.I)),
)


def classify(name: str) -> str:
    for cat, rx in _CATS:
        if rx.search(name):
            return cat
    return "other"


def build_bucket(name: str, seconds: float):
    from skred_tpu.assets import WaveBank
    from skred_tpu.engine.fused import _pad_quantum
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import (bucket_key, fill_bucket,
                                          pack_stacked, pad_segments_pow2,
                                          stack_timelines)

    bank = WaveBank()
    path = REF / name
    if not path.exists():
        path = pathlib.Path(__file__).resolve().parents[1] / "corpus" / name
    tl = compile_script(path.read_text().splitlines(), seconds,
                        bank=bank, script_dir=path.parent)
    k = bucket_key(tl)
    group = fill_bucket([tl], k[0], 4)
    st = pack_stacked(stack_timelines(group))
    per = _pad_quantum(st, st.params["amp"].shape[-1])
    pad_b = (-len(group)) % max(per, 1)
    if pad_b:
        st = pack_stacked(stack_timelines(group + [group[-1]] * pad_b))
    return pad_segments_pow2(st)


def trace_events(tmpdir: str):
    """All (plane_name, event_name, duration_ns, stats) from the newest
    xplane capture under ``tmpdir``."""
    import jax

    files = sorted(pathlib.Path(tmpdir).rglob("*.xplane.pb"),
                   key=lambda p: p.stat().st_mtime)
    if not files:
        raise SystemExit("no .xplane.pb captured — profiler unsupported "
                         "on this backend?")
    pd = jax.profiler.ProfileData.from_file(str(files[-1]))
    out = []
    for plane in pd.planes:
        for line in plane.lines:
            for ev in line.events:
                stats = {}
                try:
                    for k, v in ev.stats:
                        stats[k] = v
                except Exception:
                    pass
                out.append((plane.name, line.name, ev.name,
                            ev.duration_ns, stats))
    return out


def main() -> None:
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.engine.fused import _feat_tiers, render_fused_stream_device
    from skred_tpu.parallel.roofline import (GRID_STEP_COST,
                                             estimate_bucket)

    CHUNK = 172
    results = []
    for name in SCRIPTS:
        st = build_bucket(name, SECONDS)
        nb = (st.num_blocks // CHUNK) * CHUNK
        render_fused_stream_device(st, CHUNK, warmup_only=True)
        render_fused_stream_device(st, CHUNK)        # steady-state warm run
        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            with jax.profiler.trace(td):
                render_fused_stream_device(st, CHUNK)
            wall = time.time() - t0
            evs = trace_events(td)

        dev_planes = {p for p, *_ in evs
                      if "TPU" in p.upper() or "device" in p.lower()}
        # XLA op lines nest (module > op); sum only the leaf "XLA Ops"
        # style lines to avoid double counting — fall back to the
        # longest-total line per plane.
        per_line = collections.defaultdict(float)
        for p, ln, _, dur, _ in evs:
            if p in dev_planes:
                per_line[(p, ln)] += dur
        op_lines = {pl for pl in per_line
                    if re.search(r"ops|step", pl[1], re.I)} or \
            {max(per_line, key=per_line.get)} if per_line else set()

        cat_ns = collections.Counter()
        op_ns = collections.Counter()
        while_ns = 0.0
        flops_stat = 0.0
        bytes_stat = 0.0
        for p, ln, name_, dur, stats in evs:
            if (p, ln) not in op_lines:
                continue
            if re.match(r"%?while", name_):
                # a %while op's duration is the WHOLE loop including its
                # body — counting it as a category double-counts every
                # child op.  Track the loop total separately.
                while_ns += dur
                continue
            cat_ns[classify(name_)] += dur
            op_ns[name_] += dur
            for sk, sv in stats.items():
                try:
                    if "flop" in str(sk).lower():
                        flops_stat += float(sv)
                    if "bytes" in str(sk).lower():
                        bytes_stat += float(sv)
                except (TypeError, ValueError):
                    pass

        busy_s = sum(cat_ns.values()) / 1e9
        est = estimate_bucket(st, _feat_tiers(st))
        model = est.roofline(wall, nb)
        row = {
            "script": name,
            "batch": st.batch,
            "tiers": list(st.tiers or ()),
            "wall_s": round(wall, 3),
            "device_busy_s": round(busy_s, 3),
            "dispatch_gap_pct": round(100 * (1 - busy_s / wall), 1)
            if wall else None,
            "block_loop_total_ms": round(while_ns / 1e6, 1),
            "categories_ms": {k: round(v / 1e6, 1)
                              for k, v in cat_ns.most_common()},
            "top_ops_ms": {k: round(v / 1e6, 1)
                           for k, v in op_ns.most_common(12)},
            "model": model,
            "model_bytes_per_block": est.bytes_per_block,
            "model_flops_per_block": est.flops_per_block,
            "model_lut_steps_per_block": est.lut_steps_per_block,
            "xla_stat_flops": flops_stat or None,
            "xla_stat_bytes": bytes_stat or None,
            "blocks": nb,
            "grid_step_cost_model_s": GRID_STEP_COST,
        }
        results.append(row)
        print(json.dumps(row, indent=1), flush=True)

    out = pathlib.Path(__file__).resolve().parents[1] / \
        "PROFILE_ROOFLINE.json"
    out.write_text(json.dumps(
        {"seconds": SECONDS, "chunk": CHUNK, "buckets": results},
        indent=1))
    print(f"wrote {out}")


main()
