"""Batch + multi-chip rendering.

The reference renders one song in real time on one CPU thread.  The TPU
framework's throughput axis is *batch*: many scripts render concurrently as
a stacked ``[scripts, …]`` tensor program (vmap over the block renderer),
and the batch axis shards over a ``jax.sharding.Mesh`` for multi-chip —
scripts are independent, so data parallelism needs no collectives and all
communication stays on ICI (there is none on the render path).

Scripts are padded to a common segment count (repeating their final
segment) and share one packed wavetable buffer and one noise stream.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import List, Optional, Sequence

import jax
import numpy as np

from skred_tpu import config as C
from skred_tpu.assets.bank import WaveBank, write_wav_16
from skred_tpu.engine.render import _render_batch_jit
from skred_tpu.host.timeline import Timeline, compile_script, noise_stream

V = C.VOICE_MAX


@dataclasses.dataclass
class StackedTimelines:
    params: dict                 # name → [B, S, V] (volume_final: [B, S])
    ops: dict                    # name → [B, S, V]
    seg_of_block: np.ndarray     # [B, NB]
    seg_is_start: np.ndarray     # [B, NB]
    table_buffer: np.ndarray     # shared packed tables
    num_blocks: int
    block: int
    mod_passes: int
    fused_passes: Optional[int]
    batch: int
    n_src: int = 0               # packed modulator-source prefix (fused)
    # tiered evaluation: voices packed by modulation-DAG depth; tier k's
    # lanes are [sum(tiers[:k]), sum(tiers[:k+1])) and read only earlier
    # tiers — each voice renders exactly once per block (engine/fused.py).
    # None → depth layout unavailable (cyclic union graph): repeat-passes.
    tiers: Optional[tuple] = None


def stack_timelines(tls: Sequence[Timeline]) -> StackedTimelines:
    assert len({tl.block for tl in tls}) == 1
    assert len({tl.num_blocks for tl in tls}) == 1
    block = tls[0].block
    num_blocks = tls[0].num_blocks
    max_s = max(tl.num_segments for tl in tls)

    # shared table buffer with identity dedup: scripts sharing a bank share
    # the same table objects (procedural waves, ROMs, PCM, loaded WAVs) —
    # store each once and point every script's slots at the global copy
    uniq: dict = {}
    chunks = []
    goff = 0
    script_offmaps = []
    # Slot-align every table so the Pallas VMEM lookup kernels can DMA a
    # voice's table as one block: small tables (<= 4096) start on 4096
    # boundaries, everything larger starts on 32768 boundaries so tables
    # up to 32768 samples are contained in one medium slot.
    SLOT, SLOT_MED = 4096, 32768
    for tl in tls:
        offmap = np.zeros(max(len(tl.table_arrays), 1), dtype=np.int32)
        for i, arr in enumerate(tl.table_arrays):
            key = id(arr)
            if key not in uniq:
                a = np.asarray(arr, dtype=np.float32)
                align = SLOT if a.size <= SLOT else SLOT_MED
                lead = (-goff) % align
                if lead:
                    chunks.append(np.zeros(lead, np.float32))
                    goff += lead
                uniq[key] = goff
                pad = (-a.size) % SLOT
                if pad:
                    a = np.concatenate([a, np.zeros(pad, np.float32)])
                chunks.append(a)
                goff += a.size
            offmap[i] = uniq[key]
        script_offmaps.append(offmap)
    if goff % SLOT_MED:
        chunks.append(np.zeros((-goff) % SLOT_MED, np.float32))
    table_buffer = (np.concatenate(chunks).astype(np.float32)
                    if chunks else np.zeros(SLOT_MED, np.float32))

    def pad_seg(a: np.ndarray, s: int) -> np.ndarray:
        if a.shape[0] == s:
            return a
        reps = np.repeat(a[-1:], s - a.shape[0], axis=0)
        return np.concatenate([a, reps], axis=0)

    params = {}
    names = set(tls[0].params) | {"table_off"}
    for name in names:
        rows = []
        for tl, offmap in zip(tls, script_offmaps):
            if name == "table_off":
                a = offmap[tl.params["table_key"]].astype(np.int32)
            else:
                a = tl.params[name]
            rows.append(pad_seg(a, max_s))
        params[name] = np.stack(rows)
    ops = {}
    for name in tls[0].ops:
        rows = []
        for tl in tls:
            a = tl.ops[name]
            pad = np.zeros((max_s - a.shape[0],) + a.shape[1:], dtype=a.dtype)
            if name == "copy_hold_from":
                pad = pad - 1
            rows.append(np.concatenate([a, pad], axis=0))
        ops[name] = np.stack(rows)

    return StackedTimelines(
        params=params, ops=ops,
        seg_of_block=np.stack([tl.seg_of_block for tl in tls]),
        seg_is_start=np.stack([tl.seg_is_start for tl in tls]),
        table_buffer=table_buffer,
        num_blocks=num_blocks, block=block,
        mod_passes=max(tl.mod_passes for tl in tls),
        fused_passes=(None if any(tl.fused_passes is None for tl in tls)
                      else max(tl.fused_passes for tl in tls)),
        batch=len(tls),
    )


def _prep_params(st: StackedTimelines):
    params = dict(st.params)
    for old, new in (("flt_b0", "b0"), ("flt_b1", "b1"), ("flt_b2", "b2"),
                     ("flt_a1", "na1"), ("flt_a2", "na2")):
        a = params.pop(old)
        params[new] = -a if new.startswith("na") else a
    params.pop("table_key", None)
    # the renderer reads table_key only through table_off
    params["table_key"] = np.zeros_like(params["table_off"])
    return params


def render_stacked(st: StackedTimelines, mesh: Optional[jax.sharding.Mesh] = None,
                   noise: Optional[np.ndarray] = None) -> np.ndarray:
    """Render a stacked batch → [B, T, 2].  With a mesh, the batch axis is
    sharded across devices (pure data parallel over ICI)."""
    total = st.num_blocks * st.block
    if noise is None:
        noise = noise_stream(total)
    params = _prep_params(st)

    if mesh is not None:
        pspec = jax.sharding.PartitionSpec("dp")
        batch_sh = jax.sharding.NamedSharding(mesh, pspec)
        repl_sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        put_b = lambda a: jax.device_put(np.asarray(a), batch_sh)
        put_r = lambda a: jax.device_put(np.asarray(a), repl_sh)
    else:
        put_b = put_r = jax.numpy.asarray

    params = {k: put_b(v) for k, v in params.items()}
    ops = {k: put_b(v) for k, v in st.ops.items()}
    out = _render_batch_jit(
        params, ops, put_b(st.seg_of_block), put_b(st.seg_is_start),
        put_r(st.table_buffer), put_r(noise),
        num_blocks=st.num_blocks, block=st.block,
        mod_passes=st.mod_passes, capture=False)
    return np.asarray(out).reshape(st.batch, total, 2)


def render_batch(scripts: List[pathlib.Path], seconds: float,
                 outdir: Optional[pathlib.Path] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 engine: str = "auto") -> np.ndarray:
    """Batch-render scripts with per-script error isolation: a script that
    fails to compile is skipped (reported) without killing the batch —
    the analog of the reference's parse-and-survive stance.

    engine: "auto" groups scripts by (voices, passes, feature set) and
    renders each group with the specialized fused engine (cyclic
    modulation graphs fall back to the compat scan engine); "compat"
    renders everything with the bit-exact scan engine."""
    bank = WaveBank()
    tls, ok_scripts = [], []
    for p in scripts:
        try:
            tls.append(compile_script(p.read_text().splitlines(), seconds,
                                      bank=bank, script_dir=p.resolve().parent))
            ok_scripts.append(p)
        except Exception as ex:   # noqa: BLE001 — isolate per script
            print(f"# skipping {p}: {type(ex).__name__}: {ex}")
    if not tls:
        return np.zeros((0, 0, 2), np.float32)

    if engine == "compat":
        st = stack_timelines(tls)
        out = render_stacked(st, mesh=mesh)
    else:
        from skred_tpu.engine.fused import _pad_quantum, render_fused

        buckets = {}
        compat_idx = []
        for i, tl in enumerate(tls):
            if tl.fused_passes is None:
                compat_idx.append(i)
                continue
            buckets.setdefault(bucket_key(tl), []).append(i)
        ndev = mesh.size if mesh is not None else 1
        out = None
        for key, idxs in sorted(buckets.items()):
            rows = [tls[i] for i in idxs]
            st = pack_stacked(stack_timelines(rows))
            # pad rows so the (pallas-padded) batch shards evenly over the
            # mesh: a multiple of lcm(pallas lane quantum, device count)
            per = _pad_quantum(st, st.params["amp"].shape[-1])
            q = per * ndev // np.gcd(per, ndev)
            pad_b = (-len(rows)) % max(q, 1)
            if pad_b:
                st = pack_stacked(
                    stack_timelines(rows + [rows[-1]] * pad_b))
            o = render_fused(st, mesh=mesh)
            if out is None:
                out = np.zeros((len(tls), o.shape[1], 2), np.float32)
            for j, i in enumerate(idxs):
                out[i] = o[j]
        if compat_idx:
            # cyclic modulation graphs: per-frame serial Pallas engine
            # (engine/cyclic.py) when the script is eligible — one
            # replicated bucket per script identity keeps the per-voice
            # table windows row-uniform.  Only gate-refused scripts fall
            # back to the compat scan, and LOUDLY: on an accelerator the
            # scan runs ~3 orders of magnitude slower than the kernels
            # (reference has no such cliff — synth.c:548-556).
            import sys as _sys

            from skred_tpu.engine import kernels as _K
            from skred_tpu.engine.cyclic import (ROWS_QUANTUM, cyclic_gate,
                                                 render_cyclic)

            # the Pallas engine needs a real TPU (or interpreter mode,
            # for tests); on CPU the compat scan IS the right engine
            use_cyc = jax.default_backend() == "tpu" or _K.INTERPRET
            scan_idx = []
            for i in compat_idx if use_cyc else []:
                stc = pack_stacked(stack_timelines([tls[i]] * ROWS_QUANTUM),
                                   cyclic=True)
                reason = cyclic_gate(stc)
                if reason is not None:
                    print(f"# WARNING: cyclic Pallas engine refused "
                          f"script #{i} ({reason}); falling back to the "
                          f"compat scan engine (orders of magnitude "
                          f"slower on accelerators)",
                          file=_sys.stderr, flush=True)
                    scan_idx.append(i)
                    continue
                o = render_cyclic(stc)
                if out is None:
                    out = np.zeros((len(tls), o.shape[1], 2), np.float32)
                out[i] = o[0]
            if use_cyc:
                compat_idx = scan_idx
        if compat_idx:
            rows = [tls[i] for i in compat_idx]
            pad_b = (-len(rows)) % max(ndev, 1)
            st = stack_timelines(rows + [rows[-1]] * pad_b)
            o = render_stacked(st, mesh=mesh)
            if out is None:
                out = np.zeros((len(tls), o.shape[1], 2), np.float32)
            for j, i in enumerate(compat_idx):
                out[i] = o[j]

    if outdir is not None:
        for p, audio in zip(ok_scripts, out):
            write_wav_16(outdir / (p.stem + ".wav"), audio)
    return out


_MOD_TYPES = ("freq_mod_osc", "amp_mod_osc", "pan_mod_osc", "cz_mod_osc")
_EDGE_FIELDS = ("freq_mod_osc", "amp_mod_osc", "pan_mod_osc", "cz_mod_osc",
                "freq_mod_depth", "amp_mod_depth", "pan_mod_depth",
                "cz_mod_depth", "cz_mode", "disconnect")


def _union_depths(params_b: dict, rel: np.ndarray):
    """Per-voice depth in the union (over segments) of the value-carrying
    modulation graphs: depth(v) = 0 if v reads nothing, else
    1 + max(depth of its modulators).  Returns {voice: depth} or None if
    the union graph is cyclic (per-segment graphs may still be acyclic —
    the caller falls back to the repeat-passes layout)."""
    from skred_tpu.host.timeline import _edges_from_arrays

    rel_set = set(int(v) for v in rel)
    nseg = params_b["amp"].shape[0]
    edges = {v: set() for v in rel_set}
    for s in range(nseg):
        seg = {name: params_b[name][s] for name in _EDGE_FIELDS}
        for v in rel_set:
            # pan-mod edges don't order the tier layout: pan is applied
            # globally after all tiers (engine/fused.py block_step)
            for m in _edges_from_arrays(seg, v, include_pan=False):
                if m != v:
                    edges[v].add(m)
    depth = {}
    visiting = set()

    def dfs(v):
        if v in depth:
            return depth[v]
        if v in visiting:
            raise ValueError("cycle")
        visiting.add(v)
        d = 0
        for m in edges[v]:
            d = max(d, dfs(m) + 1)
        visiting.discard(v)
        depth[v] = d
        return d

    try:
        for v in rel_set:
            dfs(v)
    except ValueError:
        return None
    return depth


def _relevant_voices(params: dict) -> np.ndarray:
    """Voices that can influence output: active in any segment, plus the
    transitive closure of their modulation sources (a read of an inactive
    source still yields a 0 multiplier — the edge matters)."""
    amp = params["amp"]              # [S, V]
    nseg, nv = amp.shape
    rel = set(np.where((amp != 0).any(axis=0))[0].tolist())
    frontier = list(rel)
    while frontier:
        nxt = []
        for name in _MOD_TYPES:
            osc = params[name]
            for v in frontier:
                for s in range(nseg):
                    m = int(osc[s, v])
                    if m >= 0 and m not in rel:
                        rel.add(m)
                        nxt.append(m)
        frontier = nxt
    return np.array(sorted(rel), dtype=np.int32)


def pack_stacked(st: StackedTimelines, pack: bool = True,
                 cyclic: bool = False) -> StackedTimelines:
    """Pack each script's relevant voices densely (fused-engine layout).

    ``cyclic=True`` selects the cyclic-engine layout instead: packed
    lanes in ascending ORIGINAL index order (no tiers, no source
    prefix), so the per-frame serial voice loop of engine/cyclic.py
    preserves the reference's evaluation order; the ``*_delayed`` /
    ``*_self`` flags (computed from original indices either way) carry
    the same-frame-vs-previous read rule.

    Voices are laid out by modulation-DAG depth ("tiers"): tier k's lanes
    read only tiers < k, so the fused engine renders each voice exactly
    once per block — tier by tier — instead of repeating full fixed-point
    passes.  A ``-1`` perm entry is a filler lane (tier padding across
    the batch): inactive, contributes nothing.

    The serial in-frame modulation order (synth.c:526: current-sample read
    iff modulator index < reader index) is preserved through explicit
    per-edge ``*_delayed`` / ``*_self`` flags computed from the ORIGINAL
    indices, so renumbering is transparent.  Irrelevant voices (never
    audible, never read) are dropped — the per-sample table gather is the
    TPU throughput ceiling and scales with packed voice count."""
    B = st.batch

    def _sources(params_b, rel):
        """Voices read by any relevant voice (transitively closed by
        construction: a source's dependencies are themselves read)."""
        src = set()
        for name in _MOD_TYPES:
            osc = params_b[name]
            for v in rel:
                for s in range(osc.shape[0]):
                    m = int(osc[s, v])
                    if m >= 0:
                        src.add(m)
        return src

    tiers = None
    if pack:
        # memoize per unique script row (replicated batches are common)
        cache: dict = {}
        infos = []
        for b in range(B):
            key = b"".join(np.ascontiguousarray(st.params[k][b]).tobytes()
                           for k in _EDGE_FIELDS + ("amp",))
            if key not in cache:
                pb = {k: v[b] for k, v in st.params.items()}
                rel = _relevant_voices(pb)
                depths = _union_depths(pb, rel)
                src = _sources(pb, rel.tolist()) & set(rel.tolist())
                cache[key] = (rel, depths, src)
            infos.append(cache[key])

        tiers_ok = (not cyclic) and all(d is not None for _, d, _ in infos)
        if cyclic:
            perms = [np.array(sorted(rel.tolist()), dtype=np.int32)
                     for rel, _, _ in infos]
            vp = max((len(p) for p in perms), default=1)
            n_src = 0
        elif tiers_ok:
            n_tiers = max((max(d.values()) + 1 if d else 1)
                          for _, d, _ in infos)
            tsizes = [0] * n_tiers
            for _, d, _ in infos:
                cnt = [0] * n_tiers
                for v, k in d.items():
                    cnt[k] += 1
                tsizes = [max(a, c) for a, c in zip(tsizes, cnt)]
            if not any(tsizes):
                tsizes = [1]
            perms = []
            pcache: dict = {}
            for _, d, _ in infos:
                pkey = id(d)
                if pkey not in pcache:
                    perm = []
                    for k in range(len(tsizes)):
                        vs = sorted(v for v, kk in d.items() if kk == k)
                        perm += vs + [-1] * (tsizes[k] - len(vs))
                    pcache[pkey] = np.array(perm, dtype=np.int32)
                perms.append(pcache[pkey])
            vp = sum(tsizes)
            tiers = tuple(tsizes)
            n_src = vp - tsizes[-1]
        else:
            perms = []
            n_srcs = []
            for rel, _, src in infos:
                # modulator sources first: early fixed-point passes only
                # need their blocks
                ordered = sorted(src) + sorted(set(rel.tolist()) - src)
                perms.append(np.array(ordered, dtype=np.int32))
                n_srcs.append(len(src))
            vmax = max((len(p) for p in perms), default=1)
            vp = 1
            while vp < vmax:
                vp *= 2
            vp = min(vp, V)
            smax = max(n_srcs, default=0)
            n_src = 0
            if smax:
                n_src = 1
                while n_src < smax:
                    n_src *= 2
            n_src = min(n_src, vp)
    else:
        perms = [np.arange(V, dtype=np.int32) for _ in range(B)]
        vp = V
        n_src = V

    def pack_arr(a, perm, fill=0):
        out = np.full(a.shape[:-1] + (vp,), fill, dtype=a.dtype)
        live = perm >= 0
        out[..., : len(perm)][..., live] = a[..., perm[live]]
        return out

    new_params = {k: [] for k in st.params}
    for extra in ("fm_delayed", "cm_delayed", "am_delayed", "pm_delayed",
                  "fm_self", "am_self", "pm_self"):
        new_params[extra] = []
    new_ops = {k: [] for k in st.ops}
    for b in range(B):
        perm = perms[b]
        live = perm >= 0
        inv = np.full(V, -1, dtype=np.int32)
        inv[perm[live]] = np.arange(len(perm), dtype=np.int32)[live]
        for k, arr in st.params.items():
            a = arr[b]
            if a.ndim == 1:          # scalar per segment (volume_final)
                new_params[k].append(a)
                continue
            p = pack_arr(a, perm, fill=-1 if k in _MOD_TYPES else 0)
            if k in _MOD_TYPES:
                old = p                       # original target indices
                remapped = np.where(old >= 0, inv[np.maximum(old, 0)], -1)
                new_params[k].append(remapped.astype(np.int32))
                orig_n = np.broadcast_to(perm[None, :len(perm)],
                                         (a.shape[0], len(perm)))
                flag = np.zeros(old.shape, dtype=np.int32)
                flag[..., :len(perm)] = ((old[..., :len(perm)] >= orig_n)
                                         & live[None, :])
                selff = np.zeros(old.shape, dtype=np.int32)
                selff[..., :len(perm)] = ((old[..., :len(perm)] == orig_n)
                                          & live[None, :])
                key = {"freq_mod_osc": "fm", "amp_mod_osc": "am",
                       "pan_mod_osc": "pm", "cz_mod_osc": "cm"}[k]
                new_params[key + "_delayed"].append(flag)
                if key in ("fm", "am", "pm"):
                    new_params[key + "_self"].append(selff)
            else:
                new_params[k].append(p)
        for k, arr in st.ops.items():
            a = pack_arr(arr[b], perm, fill=-1 if k == "copy_hold_from" else 0)
            if k == "copy_hold_from":
                a = np.where(a >= 0, inv[np.maximum(a, 0)], -1).astype(np.int32)
            new_ops[k].append(a)
    params = {k: np.stack(v) for k, v in new_params.items()}
    ops = {k: np.stack(v) for k, v in new_ops.items()}

    # ---- table-lookup rosters ----
    # Three tiers: voices whose tables all fit a 4096-float slot read from
    # the small Pallas VMEM LUT; tables up to 32768 go through the medium
    # LUT via a dense roster; only the rare larger PCM keeps the XLA HBM
    # gather — the original TPU throughput ceiling.
    ts = params["table_size"]                          # [B, S, Vp]
    ti = params["table_index"]
    nz = ti != C.WAVE_TABLE_NOISE_ALT
    med = ((ts > 4096) & (ts <= 32768) & nz).any(axis=1)      # [B, Vp]
    big = ((ts > 32768) & nz).any(axis=1)
    med = med & ~big           # a voice ever binding a >32K table → gather
    params["small_voice"] = np.broadcast_to(
        (~(med | big)).astype(np.int32)[:, None, :], ts.shape).copy()
    params["med_voice"] = np.broadcast_to(
        med.astype(np.int32)[:, None, :], ts.shape).copy()
    vp_ = ts.shape[2]

    def roster(mask, name, width):
        """Dense compaction of ``mask`` columns: entries are voice indices
        local to the slice, ``width`` is the no-op sentinel."""
        gmax = int(mask.sum(axis=1).max()) if mask.size else 0
        if not gmax:
            return
        bm = np.full((B, gmax), width, np.int32)
        for b in range(B):
            w = np.where(mask[b])[0]
            bm[b, : len(w)] = w
        params[name] = np.broadcast_to(
            bm[:, None, :], (B, ts.shape[1], gmax)).copy()

    if tiers is not None:
        # per-tier rosters with tier-local indices (the tiered engine
        # renders each tier's lane slice in its own pass)
        bounds = np.cumsum((0,) + tiers)
        for k in range(len(tiers)):
            s, e = int(bounds[k]), int(bounds[k + 1])
            roster(med[:, s:e], f"med_map_t{k}", e - s)
            roster(big[:, s:e], f"big_map_t{k}", e - s)
    else:
        roster(med, "med_map", vp_)
        roster(big, "big_map", vp_)
    return dataclasses.replace(st, params=params, ops=ops, n_src=n_src,
                               tiers=tiers)


def bucket_key(tl) -> tuple:
    """Specialization bucket for a fused-capable timeline: (packed voice
    count, fixed-point passes, static feature set).  Scripts sharing a
    key render in one specialized compiled program; bench.py,
    tools/tpu_parity.py --bucketed and render_batch all group by this so
    validation runs the exact programs the bench times.

    Feature flags stay IN the key — round 5 measured the alternative
    (merge same-(voices, passes) classes, union feature set) and it
    LOST: mixed scripts break same-table slot uniformity (per-slot-run
    lookups), break row-uniform read topology (modulator-bank fold
    ineligible), and force every script through the union stage set —
    the merged corpus bench read 5,446x aggregate vs 10,387x split
    (PERF.md round 5, "bucket-merging rejection").

    The single-row pack is memoized on the timeline object (the pack is
    O(segments·voices) Python work; large corpora call this per script
    and then re-pack each group)."""
    cached = getattr(tl, "_bucket_key", None)
    if cached is not None:
        return cached
    from skred_tpu.engine.fused import compute_feat

    st1 = pack_stacked(stack_timelines([tl]))
    key = (st1.params["amp"].shape[-1], tl.fused_passes, compute_feat(st1))
    tl._bucket_key = key
    return key


def fill_bucket(group: list, vp: int, min_reps: int = 4) -> list:
    """Replicate a bucket's timelines to the row count that amortizes
    per-block fixed costs (bench.py's fill policy — light scripts nearly
    double their throughput from 256 to 1024 rows).

    Layout: the distinct scripts first (consumers reading the head rows
    see one of each), then each script's replicas in an ADJACENT run —
    with the voice-major LUT grid (engine/fused.py) same-table lanes
    land on consecutive grid steps and the table re-DMA is skipped."""
    # the per-block glue is op-overhead-bound (parallel/roofline.py:
    # heavy buckets sit at a few % of HBM/VPU peaks), so throughput keeps
    # rising with rows: 48.sk-class buckets cost only ~1.4x wall for 2x
    # rows.  Light buckets are cheap either way; mid buckets mostly get
    # lifted to 1024 by the serial kernels' lane quantum already.
    target = 2048 if (vp <= 2 or vp > 8) else 1024
    reps = max(min_reps, -(-target // len(group)))
    # order the distinct scripts by their table-binding signature:
    # scripts bound to the same tables sit adjacent, so the megakernel's
    # voice-major lane groups are slot-uniform (one table DMA + one
    # vectorized sweep per grid step) even across the distinct head rows
    group = sorted(group, key=_table_sig)
    rows = list(group)
    for tl in group:
        rows += [tl] * (reps - 1)
    return rows


def _table_sig(tl) -> tuple:
    """Table-binding signature of a timeline: the identity of the table
    array each (segment, voice) slot binds.  Rows sharing a signature
    share table slots after stack_timelines' identity dedup."""
    sig = getattr(tl, "_table_sig", None)
    if sig is None:
        keys = np.asarray(tl.params["table_key"]).ravel()
        arrs = tl.table_arrays
        sig = tuple(id(arrs[k]) if 0 <= k < len(arrs) else -1 for k in keys)
        tl._table_sig = sig
    return sig


def pad_segments_pow2(st: StackedTimelines) -> StackedTimelines:
    """Pad the segment axis to a power of two (repeating the final
    segment) so compiled shapes are duration-independent — repeated
    benches and production batches of similar scripts reuse the
    persistent compile cache."""
    s = st.params["amp"].shape[1]
    sp = 1
    while sp < s:
        sp *= 2
    if sp == s:
        return st

    def pad(a):
        a = np.asarray(a)
        reps = np.repeat(a[:, -1:], sp - s, axis=1)
        return np.concatenate([a, reps], axis=1)

    return dataclasses.replace(
        st, params={k: pad(v) for k, v in st.params.items()},
        ops={k: pad(v) for k, v in st.ops.items()})


def make_mesh(n_devices: Optional[int] = None) -> jax.sharding.Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.array(devs), ("dp",))


def fused_cost_per_device(st: StackedTimelines,
                          mesh: jax.sharding.Mesh) -> float:
    """XLA cost-analysis FLOPs of the per-device SPMD program for a
    dp-sharded fused render — the weak-scaling metric.

    On the virtual CPU mesh (one physical host core behind N virtual
    devices) wall-clock weak scaling is physically meaningless, but the
    per-device partitioned module is not: with the batch axis sharded
    over ``dp`` and a fixed rows-per-device, its FLOPs must stay flat as
    the mesh grows.  A sharding regression that replicates work (or
    inserts a gathering collective) shows up as per-device FLOPs growing
    with the device count — a slope, not just a wrong answer."""
    from skred_tpu.engine.fused import (_feat_tiers, _fused_jit,
                                        compute_feat)
    from skred_tpu.host.timeline import noise_stream

    if "fm_delayed" not in st.params:
        st = pack_stacked(st)
    params = _prep_params(st)
    noise = noise_stream(st.num_blocks * st.block)
    bsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    rsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    put_b = lambda a: jax.device_put(np.asarray(a), bsh)
    put_r = lambda a: jax.device_put(np.asarray(a), rsh)
    lowered = _fused_jit.lower(
        {k: put_b(v) for k, v in params.items()},
        {k: put_b(v) for k, v in st.ops.items()},
        put_b(st.seg_of_block), put_b(st.seg_is_start),
        put_r(st.table_buffer), put_r(noise),
        num_blocks=st.num_blocks, block=st.block,
        mod_passes=st.fused_passes, capture=False, exact=False,
        use_pallas=False, n_src=st.n_src, feat=compute_feat(st),
        tiers=st.tiers, feat_tiers=_feat_tiers(st), mega_tiers=None)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):   # older jax: list per device
        cost = cost[0]
    return float(cost["flops"])
