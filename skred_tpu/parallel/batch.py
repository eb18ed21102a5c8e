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
    batch: int


def stack_timelines(tls: Sequence[Timeline]) -> StackedTimelines:
    assert len({tl.block for tl in tls}) == 1
    assert len({tl.num_blocks for tl in tls}) == 1
    block = tls[0].block
    num_blocks = tls[0].num_blocks
    max_s = max(tl.num_segments for tl in tls)

    # shared table buffer: concatenate each script's packed tables and
    # rebase its per-voice offsets
    buffers, bases = [], []
    off = 0
    for tl in tls:
        bases.append(off)
        buffers.append(tl.table_buffer)
        off += tl.table_buffer.size
    table_buffer = np.concatenate(buffers).astype(np.float32)

    def pad_seg(a: np.ndarray, s: int) -> np.ndarray:
        if a.shape[0] == s:
            return a
        reps = np.repeat(a[-1:], s - a.shape[0], axis=0)
        return np.concatenate([a, reps], axis=0)

    params = {}
    names = set(tls[0].params) | {"table_off"}
    for name in names:
        rows = []
        for tl, base in zip(tls, bases):
            if name == "table_off":
                a = (tl.table_offsets[tl.params["table_key"]] + base).astype(np.int32)
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
                 mesh: Optional[jax.sharding.Mesh] = None) -> np.ndarray:
    bank = WaveBank()
    tls = [
        compile_script(p.read_text().splitlines(), seconds, bank=bank,
                       script_dir=p.resolve().parent)
        for p in scripts
    ]
    st = stack_timelines(tls)
    out = render_stacked(st, mesh=mesh)
    if outdir is not None:
        for p, audio in zip(scripts, out):
            write_wav_16(outdir / (p.stem + ".wav"), audio)
    return out


def make_mesh(n_devices: Optional[int] = None) -> jax.sharding.Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.array(devs), ("dp",))
