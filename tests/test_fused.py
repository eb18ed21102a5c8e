"""Fused block-parallel engine: must match the compat (bit-exact) engine
within the -60 dB target on representative scripts, including voice
packing and the pallas kernels (interpret mode)."""

import numpy as np
import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.engine import render_timeline
from skred_tpu.engine.fused import render_fused
from skred_tpu.host.timeline import compile_script
from skred_tpu.parallel.batch import stack_timelines

SCRIPTS = ["0.sk", "2.sk", "4.sk", "24.sk", "20.sk", "33.sk", "909.sk",
           "75.sk", "15.sk"]


@pytest.fixture(scope="session")
def session_bank():
    return WaveBank()


@pytest.mark.parametrize("script", SCRIPTS)
def test_fused_vs_compat(reference_dir, session_bank, script):
    tl = compile_script((reference_dir / script).read_text().splitlines(),
                        1.0, bank=session_bank.fork(), script_dir=reference_dir)
    st = stack_timelines([tl])
    out = render_fused(st, use_pallas=False)[0]
    ref = render_timeline(tl)
    m = min(len(out), len(ref))
    err = float(np.abs(out[:m] - ref[:m]).max())
    db = 20 * np.log10(err + 1e-30)
    assert db <= -60.0, f"{script}: fused differs {db:.1f} dB"


def test_fused_batch_dedup(reference_dir, session_bank):
    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.5,
                          bank=session_bank.fork(), script_dir=reference_dir)
           for n in ("909.sk", "10.sk", "909.sk")]
    st = stack_timelines(tls)
    # replicated scripts share tables: dedup keeps the buffer near the
    # single-script sizes, not 3x
    assert st.table_buffer.size < sum(tl.table_buffer.size for tl in tls)
    out = render_fused(st, use_pallas=False)
    for i, tl in enumerate(tls):
        r = render_timeline(tl)
        err = float(np.abs(out[i][: len(r)] - r).max())
        assert 20 * np.log10(err + 1e-30) <= -60.0


def test_pallas_kernels_interpret(reference_dir, session_bank):
    from skred_tpu.engine import kernels

    tl = compile_script((reference_dir / "0.sk").read_text().splitlines(),
                        0.05, bank=session_bank.fork(),
                        script_dir=reference_dir, block=128)
    st = stack_timelines([tl] * 3)
    a = render_fused(st, use_pallas=False)
    old = kernels.INTERPRET
    kernels.INTERPRET = True
    try:
        b = render_fused(st, use_pallas=True)
    finally:
        kernels.INTERPRET = old
    assert np.array_equal(a, b), "pallas kernels must match the scan path"
