#!/usr/bin/env python3
"""On-chip parity check: render scripts with the fused TPU engine (exact
mode, Pallas kernels, VMEM table LUT) and compare against the bit-exact
compat engine.

Usage:  python tools/tpu_parity.py [seconds] [script.sk ... | all]
                                   [--bucketed] [--replicas N] [--fast]

--fast validates exact=False (plain hardware arithmetic, the programs
bench.py --fast times) against the same -60 dB target.

Every script must come in at or below the -60 dB target (BASELINE.md).
The exact mode reproduces the reference binary's arithmetic on TPU:
correctly-rounded f32 division (f64 emulation), software f32 fma at the
gcc-contracted sites (engine/render.py:_fma32), and the exact-fma Pallas
filter/smoother kernel (engine/kernels.py).

The compat reference is rendered in a separate JAX_PLATFORMS=cpu
subprocess: inside the TPU (axon) process even CPU executables are
compiled by the remote helper for a different host microarchitecture,
which shifts the scan engine's numerics (observed -30 dB on 20.sk)."""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = pathlib.Path("/root/reference")
CORPUS = pathlib.Path(__file__).resolve().parent.parent / "corpus"


def script_path(n: str) -> pathlib.Path:
    p = CORPUS / n
    return p if p.exists() else REF / n


DEFAULT = ["0.sk", "2.sk", "9.sk", "10.sk", "20.sk", "24.sk", "42.sk",
           "48.sk", "65.sk", "72.sk", "909.sk"]


def compare_main(path: str, out_json: str | None = None) -> None:
    """Runs in a clean CPU process: render compat references and report."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine import render_timeline
    from skred_tpu.host.timeline import compile_script

    z = np.load(path)
    names = json.loads(str(z["names"]))
    seconds = float(z["seconds"])
    out = z["out"]
    bank = WaveBank()
    worst = []
    for i, n in enumerate(names):
        tl = compile_script(script_path(n).read_text().splitlines(), seconds,
                            bank=bank, script_dir=REF)
        ref = render_timeline(tl)
        m = min(out.shape[1], len(ref))
        err = float(np.abs(out[i, :m] - ref[:m]).max())
        db = 20 * np.log10(err + 1e-30)
        flag = "OK " if db <= -60.0 else "FAIL"
        print(f"{flag} {n:10s} {db:8.1f} dB  err={err:.3e}", flush=True)
        worst.append((db, n))
    worst.sort(reverse=True)
    print("\nworst:", [(round(d, 1), n) for d, n in worst[:8]])
    if out_json:
        dbs = sorted(d for d, _ in worst)
        pathlib.Path(out_json).write_text(json.dumps({
            "scripts": {n: round(d, 1) for d, n in worst},
            "worst_db": round(worst[0][0], 1) if worst else None,
            "worst_script": worst[0][1] if worst else None,
            "median_db": round(float(np.median(dbs)), 1) if dbs else None,
            "bit_exact": sum(1 for d, _ in worst if d <= -290.0),
            "n_scripts": len(worst),
            "pass": bool(not worst or worst[0][0] <= -60.0),
        }))
    sys.exit(1 if worst and worst[0][0] > -60.0 else 0)


def main() -> None:
    if os.environ.get("SKRED_MEGA_ABLATE"):
        sys.exit("SKRED_MEGA_ABLATE is set: kernel phases are stubbed and "
                 "every render is invalid; unset it to check parity")

    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    argv = sys.argv[1:]
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        return
    replicas = 4                     # bench.py's REPLICAS default
    if "--replicas" in argv:
        i = argv.index("--replicas")
        replicas = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    fast = "--fast" in argv
    args = [a for a in argv if a not in ("--bucketed", "--fast")]
    bucketed = "--bucketed" in argv
    # --fast: validate exact=False (plain hardware fma/divide) — the
    # configuration bench.py --fast times.  Quality target is the same
    # -60 dB; only the exact mode additionally claims bit-parity.
    exact_arg = False if fast else None
    seconds = float(args[0]) if args else 3.0
    names = args[1:] or DEFAULT
    if names == ["all"]:
        names = (sorted(p.name for p in REF.glob("*.sk"))
                 + sorted(p.name for p in CORPUS.glob("*.sk")))

    from skred_tpu.assets import WaveBank
    from skred_tpu.engine.fused import (compute_feat, render_fused,
                                        render_fused_device)
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    bank = WaveBank()
    tls = []
    kept = []
    cyclic = []          # (name, tl): dedicated cyclic engine (bucketed)
    for n in names:
        tl = compile_script(script_path(n).read_text().splitlines(), seconds,
                            bank=bank, script_dir=REF)
        if tl.fused_passes is None:
            if bucketed and not fast:
                cyclic.append((n, tl))
            else:
                print(f"SKIP {n}: cyclic graph (compat engine only)")
            continue
        tls.append(tl)
        kept.append(n)

    t0 = time.time()
    if bucketed:
        # mirror bench.py exactly — same bucket grouping, same replica
        # fill, same pow2 segment padding, same streamed-chunk program —
        # so this validates AND warms the very programs the bench times
        from skred_tpu.engine.fused import render_fused_stream
        from skred_tpu.parallel.batch import pad_segments_pow2

        CHUNK = 172
        from skred_tpu.engine.fused import _pad_quantum
        from skred_tpu.parallel.batch import bucket_key, fill_bucket

        buckets = {}
        for n, tl in zip(kept, tls):
            buckets.setdefault(bucket_key(tl), []).append((n, tl))
        outs = {}
        out_len = None
        shapes = []
        for key, group in sorted(buckets.items()):
            vp = key[0]
            # forward the same replicas bench.py passes so the validated
            # batch shape is exactly the benched one (--replicas N)
            rows = fill_bucket([tl for _, tl in group], vp, replicas)
            # fill_bucket orders the distinct head rows by table-binding
            # signature — recover each head row's script by identity
            by_id = {id(tl): n for n, tl in group}
            gn = [by_id[id(tl)] for tl in rows[:len(group)]]
            st = pack_stacked(stack_timelines(rows))
            # pad the batch to the same quantum the bench's device-stream
            # entry applies, by replicating the last row — identical
            # compiled shapes either way
            per = _pad_quantum(st, st.params["amp"].shape[-1])
            pad_b = (-len(rows)) % max(per, 1)
            if pad_b:
                st = pack_stacked(stack_timelines(rows + [rows[-1]] * pad_b))
            st = pad_segments_pow2(st)
            whole = st.num_blocks // CHUNK
            chunks = []
            for chunk in render_fused_stream(st, CHUNK, keep_rows=len(gn),
                                             exact=exact_arg):
                chunks.append(chunk)
                if len(chunks) >= whole:
                    break
            o = np.concatenate(chunks, axis=1)
            for i, n in enumerate(gn):
                outs[n] = o[i]
            out_len = o.shape[1] if out_len is None else min(out_len,
                                                             o.shape[1])
            shapes.append({"voices": int(key[0]), "passes": int(key[1]),
                           "rows": int(st.batch), "scripts": len(gn)})
            print(f"bucket v{key[0]} p{key[1]} x{st.batch} {gn}: done",
                  flush=True)
        # cyclic scripts: the dedicated per-frame Pallas engine, same
        # bucket shapes bench.py times (1024 replicated rows, CHUNK
        # streaming) — the compat scan stays the CPU oracle below
        for n, tl in cyclic:
            from skred_tpu.engine.cyclic import (ROWS_QUANTUM, cyclic_gate,
                                                 render_cyclic_stream)

            st = pack_stacked(stack_timelines([tl] * ROWS_QUANTUM),
                              cyclic=True)
            reason = cyclic_gate(st)
            if reason is not None:
                print(f"SKIP {n}: cyclic, {reason} (compat engine only)")
                continue
            whole = st.num_blocks // CHUNK
            chunks = []
            for chunk in render_cyclic_stream(st, CHUNK, keep_rows=1):
                chunks.append(chunk)
                if len(chunks) >= whole:
                    break
            o = np.concatenate(chunks, axis=1)
            outs[n] = o[0]
            kept.append(n)
            out_len = o.shape[1] if out_len is None else min(out_len,
                                                             o.shape[1])
            k = st.params["amp"].shape[-1]
            shapes.append({"voices": f"cyclic-{k}v", "passes": 0,
                           "rows": int(st.batch), "scripts": 1})
            print(f"bucket cyclic-{k}v x{st.batch} ['{n}']: done",
                  flush=True)
        out = np.stack([outs[n][:out_len] for n in kept])
        print(f"TPU render: {time.time() - t0:.1f}s "
              f"({len(kept)} scripts, {len(buckets)} buckets)")
    else:
        st = stack_timelines(tls)
        out = np.asarray(render_fused_device(st, use_pallas=True,
                                             exact=exact_arg))
        b_padded = out.shape[1]        # render_fused_device pads the batch
        out = np.moveaxis(out, 0, 1).reshape(b_padded, -1, 2)[: len(kept)]
        print(f"TPU render: {time.time() - t0:.1f}s "
              f"({len(kept)} scripts, batch padded to {b_padded})")

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        np.savez(f, out=out, names=json.dumps(kept), seconds=seconds)
        tmp = f.name
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmp_json = tmp + ".json"
    r = subprocess.run([sys.executable, __file__, "--compare", tmp,
                        cmp_json], env=env)
    os.unlink(tmp)
    # driver-parseable artifact: the flagship on-chip correctness claim,
    # machine-checkable per round the way bench_detail.json is for perf
    if bucketed and os.path.exists(cmp_json):
        res = json.loads(pathlib.Path(cmp_json).read_text())
        art = pathlib.Path(__file__).resolve().parent.parent / \
            "TPU_PARITY.json"
        art.write_text(json.dumps({
            **{k: res[k] for k in ("worst_db", "worst_script", "median_db",
                                   "bit_exact", "n_scripts", "pass")},
            "arith": "fast" if fast else "exact",
            "seconds": seconds,
            "target_db": -60.0,
            "bucketed": True,
            "replicas": replicas,
            "buckets": shapes,
            "scripts": res["scripts"],
        }, indent=1))
        print(f"wrote {art}")
    if os.path.exists(cmp_json):
        os.unlink(cmp_json)
    sys.exit(r.returncode)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--compare":
        compare_main(sys.argv[2],
                     sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        main()
