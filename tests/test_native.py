"""Native (C++) timeline compiler parity: bit-identical compile output vs
the Python oracle across the bundled script corpus."""

import pathlib

import numpy as np
import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.host.timeline import compile_script

native = pytest.importorskip("skred_tpu.host.native")

ALL_SCRIPTS = sorted(
    p.name for p in pathlib.Path("/root/reference").glob("*.sk")
) if pathlib.Path("/root/reference").exists() else []


@pytest.fixture(scope="session")
def session_bank():
    return WaveBank()


@pytest.mark.parametrize("script", ALL_SCRIPTS)
def test_native_compile_parity(reference_dir, session_bank, script):
    lines = (reference_dir / script).read_text().splitlines()
    tp = compile_script(lines, 3.0, bank=session_bank.fork(),
                        script_dir=reference_dir)
    tn = native.compile_script_native(lines, 3.0, bank=session_bank,
                                      script_dir=reference_dir)
    assert tp.num_segments == tn.num_segments, script
    assert np.array_equal(tp.seg_of_block, tn.seg_of_block)
    assert np.array_equal(tp.seg_is_start, tn.seg_is_start)
    for k in tp.params:
        assert np.array_equal(np.asarray(tp.params[k]),
                              np.asarray(tn.params[k])), f"{script}: {k}"
    for k in tp.ops:
        assert np.array_equal(np.asarray(tp.ops[k]).astype(np.int64),
                              np.asarray(tn.ops[k]).astype(np.int64)), \
            f"{script}: ops.{k}"
    assert np.array_equal(tp.table_buffer, tn.table_buffer), script
    assert tp.mod_passes == tn.mod_passes
    assert tp.fused_passes == tn.fused_passes


def test_native_renders(reference_dir, session_bank):
    """A natively-compiled timeline renders identically."""
    from skred_tpu.engine import render_timeline

    lines = (reference_dir / "24.sk").read_text().splitlines()
    tp = compile_script(lines, 1.0, bank=session_bank.fork(),
                        script_dir=reference_dir)
    tn = native.compile_script_native(lines, 1.0, bank=session_bank,
                                      script_dir=reference_dir)
    a = render_timeline(tp)
    b = render_timeline(tn)
    assert np.array_equal(a, b)
