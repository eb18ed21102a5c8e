#!/usr/bin/env python3
"""Census the optimized HLO of a bench bucket's chunk program.

Compiles the exact _fused_chunk_jit program bench.py would run for a
script's bucket (cached → cheap), then walks the optimized HLO and
reports, for the while-loop body (the per-block step):
  - count of fusions / custom-calls / other top-level ops
  - each op's output bytes (a proxy for its HBM write cost)
sorted by size, so the per-block "glue" between the Pallas kernels is
attributable op by op.

Usage: python tools/hlocensus.py [script] [seconds]
"""

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = pathlib.Path("/root/reference")
SCRIPT = sys.argv[1] if len(sys.argv) > 1 else "65.sk"
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0


def shape_bytes(shape_str):
    """Rough output bytes from an HLO result type string."""
    total = 0
    for m in re.finditer(r"(f32|s32|u32|pred|f64|s64|bf16|s8|u8)\[([\d,]*)\]",
                         shape_str):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        size = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2,
                "f64": 8, "s64": 8}.get(dt, 4)
        total += n * size
    return total


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine import fused
    from skred_tpu.engine.fused import (_fused_chunk_jit, _feat_tiers,
        _pad_quantum, compute_feat, make_carry0)
    from skred_tpu.host.timeline import compile_script, noise_stream
    from skred_tpu.parallel.batch import (bucket_key, fill_bucket,
        pack_stacked, pad_segments_pow2, stack_timelines, _prep_params)

    bank = WaveBank()
    tl = compile_script((REF / SCRIPT).read_text().splitlines(), SECONDS,
                        bank=bank, script_dir=REF)
    k = bucket_key(tl)
    rows = fill_bucket([tl], k[0])
    st = pad_segments_pow2(pack_stacked(stack_timelines(rows)))
    import dataclasses
    params0 = _prep_params(st)
    Vp = params0["amp"].shape[-1]
    per = _pad_quantum(st, Vp)
    pad_b = (-st.batch) % max(per, 1)
    if pad_b:
        rep = lambda a: np.concatenate(
            [a, np.repeat(a[-1:], pad_b, axis=0)], axis=0)
        params0 = {kk: rep(np.asarray(v)) for kk, v in params0.items()}
        st = dataclasses.replace(
            st, ops={kk: rep(np.asarray(v)) for kk, v in st.ops.items()},
            seg_of_block=rep(np.asarray(st.seg_of_block)),
            seg_is_start=rep(np.asarray(st.seg_is_start)),
            batch=st.batch + pad_b)
    params = {kk: jnp.asarray(v) for kk, v in params0.items()}
    ops = {kk: jnp.asarray(v) for kk, v in st.ops.items()}
    table = jnp.asarray(st.table_buffer)
    feat = compute_feat(st)
    fts = _feat_tiers(st)
    B = st.batch
    CHUNK = 172
    carry = make_carry0(B, Vp)
    n = jnp.asarray(noise_stream(CHUNK * st.block))
    sob = jnp.asarray(np.asarray(st.seg_of_block)[:, :CHUNK])
    sis = jnp.asarray(np.asarray(st.seg_is_start)[:, :CHUNK])
    print(f"{SCRIPT}: batch {B} Vp {Vp} tiers {st.tiers} feat "
          f"{','.join(kk for kk, v in feat._asdict().items() if v is True)}")

    lowered = _fused_chunk_jit.lower(
        carry, params, ops, sob, sis, table, n, jnp.int32(0),
        num_blocks=CHUNK, block=st.block, mod_passes=st.fused_passes,
        exact=True, use_pallas=True, n_src=st.n_src, feat=feat,
        tiers=st.tiers, feat_tiers=fts,
        mega_tiers=fused._mega_tiers(st))
    compiled = lowered.compile()
    txt = compiled.as_text()
    out_path = pathlib.Path("/tmp/hlo_census.txt")
    out_path.write_text(txt)
    print(f"optimized HLO -> {out_path} ({len(txt)} bytes)")

    # find the while body computation (the block scan)
    bodies = re.findall(r"%?(\S*body\S*) \(", txt)
    # split into computations
    comps = re.split(r"\n(?=%?\S+ \([^\)]*\) -> )", txt)
    body = max((c for c in comps if "body" in c.split("(")[0]),
               key=len, default=None)
    if body is None:
        print("no while body found; computations:", bodies[:10])
        return
    rows_out = []
    for line in body.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w\.\-]+) = (\([^\)]*\)|\S+) ([\w\-]+)\(", line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        rows_out.append((shape_bytes(shape), op, name,
                         shape if len(shape) < 70 else shape[:67] + "..."))
    rows_out.sort(reverse=True)
    from collections import Counter
    census = Counter(op for _, op, _, _ in rows_out)
    print("\nwhile-body op census:", dict(census.most_common()))
    total = sum(b for b, *_ in rows_out)
    print(f"total output bytes/block-step: {total/1e6:.2f} MB")
    print("\ntop 40 by output bytes:")
    for b, op, name, shape in rows_out[:40]:
        print(f"  {b/1e6:8.3f} MB  {op:<14} {name:<40} {shape}")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print("\ncost_analysis:",
              {kk: v for kk, v in sorted(ca.items())
               if kk in ("flops", "bytes accessed", "transcendentals",
                         "optimal_seconds")})
    except Exception as e:
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
