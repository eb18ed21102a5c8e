"""Full-corpus audio parity in CI (VERDICT r1 item 4).

Renders EVERY bundled .sk script against a golden minted from the
reference C build (golden/build/render_golden, cached in golden/out/)
— the fused engine for all scripts, the compat scan engine for the
scripts test_render.py's bit-exact cross-section does not already pin.
A regression in any of the 64 scripts now fails the suite, not just
tools/parity_sweep.py.

Short (1.5 s) so the suite stays runnable; deselect with -m "not corpus".
Reference oracle: the whole DSP graph (synth.c:502-630) driven by each
script's wire commands.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from tests.conftest import REFERENCE, REPO

SECONDS = 1.5
TARGET_DB = -60.0

# already pinned bit-exact at 2 s by test_render.py
RENDER_PINNED = {"0.sk", "2.sk", "4.sk", "9.sk", "24.sk", "33.sk", "75.sk",
                 "909.sk", "64.sk", "10.sk"}

SCRIPTS = (sorted(p.name for p in REFERENCE.glob("*.sk"))
           if REFERENCE.exists() else [])


def mint(script: str) -> np.ndarray:
    """Golden from the reference build, cached per (script, duration)."""
    out_dir = REPO / "golden" / "out"
    out_dir.mkdir(parents=True, exist_ok=True)
    f = out_dir / f"{script.replace('.sk', '')}_{SECONDS:g}.f32"
    if not f.exists():
        exe = REPO / "golden" / "build" / "render_golden"
        if not exe.exists():
            subprocess.run([str(REPO / "golden" / "build.sh")], check=True,
                           capture_output=True)
        subprocess.run([str(exe), "-d", str(SECONDS), "-o", str(f), script],
                       cwd=REFERENCE, check=True, capture_output=True)
    return np.fromfile(f, dtype=np.float32).reshape(-1, 2)


@pytest.fixture(scope="module")
def corpus_bank():
    from skred_tpu.assets import WaveBank

    return WaveBank()


def _compile(script, corpus_bank):
    from skred_tpu.host.timeline import compile_script

    return compile_script((REFERENCE / script).read_text().splitlines(),
                          SECONDS, bank=corpus_bank, script_dir=REFERENCE)


def _check(out, golden, script, engine):
    n = min(len(out), len(golden))
    assert n > 0
    err = float(np.abs(out[:n] - golden[:n]).max())
    db = 20 * np.log10(err + 1e-30)
    assert db <= TARGET_DB, f"{script} ({engine}): {db:.1f} dB (err={err:.3e})"


@pytest.mark.corpus
@pytest.mark.parametrize("script", SCRIPTS)
def test_corpus_fused(script, corpus_bank):
    """Fused engine ≤ −60 dB vs the reference C render, whole corpus."""
    tl = _compile(script, corpus_bank)
    if tl.fused_passes is None:
        pytest.skip("cyclic modulation graph: compat engine only")
    from skred_tpu.engine.fused import render_fused
    from skred_tpu.parallel.batch import stack_timelines

    out = render_fused(stack_timelines([tl]))[0]
    _check(out, mint(script), script, "fused")


@pytest.mark.corpus
@pytest.mark.parametrize("script",
                         [s for s in SCRIPTS if s not in RENDER_PINNED])
def test_corpus_compat(script, corpus_bank):
    """Compat scan engine vs the reference, scripts test_render skips."""
    from skred_tpu.engine import render_timeline

    out = render_timeline(_compile(script, corpus_bank))
    _check(out, mint(script), script, "compat")
