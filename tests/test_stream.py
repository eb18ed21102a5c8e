"""Streaming (chunked) fused rendering: exact equality with the whole
render, O(chunk) memory, LCG noise jump correctness."""

import numpy as np

from skred_tpu.assets import WaveBank
from skred_tpu.engine.fused import render_fused, render_fused_stream
from skred_tpu.host.timeline import compile_script, noise_stream
from skred_tpu.parallel.batch import stack_timelines


def test_noise_jump():
    full = noise_stream(5000)
    assert np.array_equal(full[2000:], noise_stream(3000, start=2000))
    assert np.array_equal(full, noise_stream(5000, start=0))


def test_stream_equals_whole(reference_dir):
    bank = WaveBank()
    tl = compile_script((reference_dir / "24.sk").read_text().splitlines(),
                        1.5, bank=bank, script_dir=reference_dir)
    st = stack_timelines([tl, tl])
    whole = render_fused(st, use_pallas=False)
    chunks = list(render_fused_stream(st, chunk_blocks=17, use_pallas=False))
    assert np.array_equal(np.concatenate(chunks, axis=1), whole)


def test_timeline_save_load(tmp_path, reference_dir):
    from skred_tpu.engine import render_timeline
    from skred_tpu.host.timeline import load_timeline, save_timeline

    tl = compile_script((reference_dir / "909.sk").read_text().splitlines()
                        + ["Z1"], 1.0, script_dir=reference_dir)
    save_timeline(tl, tmp_path / "tl.npz")
    tl2 = load_timeline(tmp_path / "tl.npz")
    assert np.array_equal(render_timeline(tl), render_timeline(tl2))
