#!/usr/bin/env python3
"""Endurance proof: a >=300 s streamed render on chip, parity-checked
against the compat engine at sampled windows, with sustained throughput
and flat memory recorded (VERDICT r4 item 8; reference analog: the
5-minute recorder ring /root/reference/skred.c:84-99).

Two phases so the slow CPU oracle can run while the TPU is busy:

  python tools/endurance.py oracle [script] [seconds]   # CPU compat ->
      golden windows at t = 0, mid, end (tools/endurance_oracle.npz)
  python tools/endurance.py run [script] [seconds]      # TPU streamed
      render (O(chunk) memory by construction), window parity vs the
      oracle, sustained x-realtime, host-RSS samples -> ENDURANCE.json

The streamed path is engine/fused.py render_fused_stream: state carries
in a donated pytree across chunks exactly like the reference's callback
state, so memory is O(chunk) regardless of duration.
"""

import json
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference")
WIN = 44100          # window length (1 s)

MODE = sys.argv[1] if len(sys.argv) > 1 else "run"
NAME = sys.argv[2] if len(sys.argv) > 2 else "909.sk"
SECONDS = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
ORACLE = REPO / "tools" / "endurance_oracle.npz"


def _tl(seconds):
    from skred_tpu.assets import WaveBank
    from skred_tpu.host.timeline import compile_script

    p = REPO / "corpus" / NAME
    path = p if p.exists() else REF / NAME
    return compile_script(path.read_text().splitlines(), seconds,
                          bank=WaveBank(), script_dir=REF)


def _windows(total):
    return {"start": 0, "mid": total // 2, "end": total - WIN}


def oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from skred_tpu.engine import render_timeline

    tl = _tl(SECONDS)
    t0 = time.time()
    out = np.asarray(render_timeline(tl))         # bit-exact compat scan
    total = out.shape[0]
    wins = {k: out[o:o + WIN] for k, o in _windows(total).items()}
    np.savez(ORACLE, script=NAME, seconds=SECONDS, **wins)
    print(f"# oracle: {NAME} {SECONDS:.0f}s compat render "
          f"{time.time() - t0:.0f}s wall -> {ORACLE.name}")


def run():
    import jax

    cache = REPO / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from skred_tpu.engine.fused import _pad_quantum, render_fused_stream
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    tl = _tl(SECONDS)
    st = pack_stacked(stack_timelines([tl]))
    per = _pad_quantum(st, st.params["amp"].shape[-1])
    rows = max(per, 1)
    st = pack_stacked(stack_timelines([tl] * rows))
    total = st.num_blocks * st.block
    offs = _windows(total)
    wins = {}
    got = 0
    rss = []
    t0 = time.time()
    t_first = None
    for chunk in render_fused_stream(st, chunk_blocks=172, keep_rows=1):
        if t_first is None:
            t_first = time.time() - t0      # includes the one compile
        c = chunk[0]
        for k, o in offs.items():
            lo, hi = max(o, got), min(o + WIN, got + c.shape[0])
            if lo < hi:
                wins.setdefault(k, []).append(c[lo - got:hi - got])
        got += c.shape[0]
        rss.append(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
    wall = time.time() - t0
    audio_s = rows * got / 44100.0
    g = np.load(ORACLE)
    assert str(g["script"]) == NAME and float(g["seconds"]) == SECONDS, \
        "oracle was minted for a different run"
    parity = {}
    for k in offs:
        ours = np.concatenate(wins[k], axis=0)
        ref = g[k][: ours.shape[0]]
        err = float(np.abs(ours - ref).max())
        parity[k] = round(20 * np.log10(max(err, 1e-30)), 1)
    result = {
        "script": NAME, "seconds": SECONDS, "rows": rows,
        "audio_s": round(audio_s, 1), "wall_s": round(wall, 2),
        "x_realtime": round(audio_s / wall, 1),
        "wall_after_compile_s": round(wall - t_first, 2),
        "window_parity_db": parity,
        "worst_window_db": max(parity.values()),
        "rss_mb_first": round(rss[0] / 1024, 1),
        "rss_mb_last": round(rss[-1] / 1024, 1),
        "rss_growth_pct": round(100 * (rss[-1] / rss[0] - 1), 2),
        "note": "streamed render (O(chunk) device memory by "
                "construction: donated carry, duration-independent "
                "compiled shapes); parity vs the bit-exact compat scan "
                "at 1 s windows (start/mid/end); rss is host max-RSS "
                "sampled per chunk",
    }
    (REPO / "ENDURANCE.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    assert max(parity.values()) <= -60.0, parity


if __name__ == "__main__":
    oracle() if MODE == "oracle" else run()
