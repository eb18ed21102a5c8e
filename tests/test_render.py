"""End-to-end render parity: the JAX engine must reproduce the reference C
engine bit-exactly (the C build uses the reference's own -O3 -march=native
flags whose FMA contraction matches XLA's)."""

import subprocess

import numpy as np
import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.engine import render_timeline
from skred_tpu.host.timeline import compile_script
from tests.conftest import REPO

SECONDS = 2.0

# a cross-section: FM, CZ, filters, links, envelopes, sequencer, PCM,
# user WAVs, S&H, noise, pan-mod, defer chains
SCRIPTS = ["0.sk", "2.sk", "4.sk", "9.sk", "24.sk", "33.sk", "75.sk", "909.sk",
           "64.sk", "10.sk"]


@pytest.fixture(scope="session")
def renderer(reference_dir):
    exe = REPO / "golden" / "build" / "render_golden"
    subprocess.run([str(REPO / "golden" / "build.sh")], check=True,
                   capture_output=True)
    return exe


@pytest.fixture(scope="session")
def session_bank():
    return WaveBank()


def mint(renderer, reference_dir, tmp_path, script):
    out = tmp_path / (script + ".f32")
    subprocess.run([str(renderer), "-d", str(SECONDS), "-o", str(out), script],
                   cwd=reference_dir, check=True, capture_output=True)
    return np.fromfile(out, dtype=np.float32).reshape(-1, 2)


@pytest.mark.parametrize("script", SCRIPTS)
def test_render_parity(renderer, reference_dir, session_bank, tmp_path, script):
    golden = mint(renderer, reference_dir, tmp_path, script)
    tl = compile_script((reference_dir / script).read_text().splitlines(),
                        SECONDS, bank=session_bank, script_dir=reference_dir)
    out = render_timeline(tl)
    n = min(len(out), len(golden))
    err = float(np.abs(out[:n] - golden[:n]).max())
    db = 20 * np.log10(err + 1e-30)
    assert db <= -60.0, f"{script}: {db:.1f} dB (err {err:.3e})"


def test_capture_matches_mix(reference_dir, session_bank):
    """Per-voice capture summed over voices (pre-volume) must reconstruct
    the stereo mix (post volume smoothing)."""
    tl = compile_script((reference_dir / "2.sk").read_text().splitlines(),
                        0.5, bank=session_bank, script_dir=reference_dir)
    out, cap = render_timeline(tl, capture=True)
    assert cap.shape == (len(out), 64, 2)
    # reconstruct: sum voices then apply the volume smoother
    mix = cap.sum(axis=1)
    vf = tl.params["volume_final"][0]
    g = np.float32(0.0)
    recon = np.empty_like(mix)
    for i in range(len(mix)):
        g = np.float32(g + np.float32(0.002) * (vf - g))
        recon[i] = mix[i] * g
    assert np.abs(recon - out).max() < 1e-6
