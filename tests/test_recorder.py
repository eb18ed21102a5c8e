"""Recorder parity: the '<'/'*' capture path must produce the same
multichannel WAV as the reference engine."""

import subprocess
import wave

import numpy as np
import pytest

from skred_tpu.host.timeline import compile_script
from skred_tpu.io.recorder import render_recordings
from tests.conftest import REPO


@pytest.fixture()
def workdir(tmp_path, reference_dir):
    # the reference writes its recording into CWD; give it a writable one
    # with the asset files linked in
    for p in reference_dir.glob("*.wav"):
        (tmp_path / p.name).symlink_to(p)
    for p in reference_dir.glob("*.sk"):
        (tmp_path / p.name).symlink_to(p)
    return tmp_path


LINES = ["v0 w0 f440 a4 r1", "v1 w4 f220 a2 r1", "v2 w2 f2 a1 m1",
         "<1", "~0.5 *"]


def read_wav(path):
    with wave.open(str(path)) as f:
        n = f.getnframes()
        ch = f.getnchannels()
        data = np.frombuffer(f.readframes(n), dtype="<i2")
    return data.reshape(n, ch), ch


def test_recorder_parity(workdir, reference_dir):
    exe = REPO / "golden" / "build" / "render_golden"
    cmd = [str(exe), "-R", "-d", "1.0"]
    for l in LINES:
        cmd += ["-e", l]
    subprocess.run(cmd, cwd=workdir, check=True, capture_output=True)
    ref_wavs = sorted(workdir.glob("skred-*.wav"))
    assert len(ref_wavs) == 1, "reference should have written one recording"
    ref_data, ref_ch = read_wav(ref_wavs[0])

    tl = compile_script(LINES, 1.0, script_dir=workdir)
    written = render_recordings(tl, workdir / "ours")
    assert len(written) == 1
    our_data, our_ch = read_wav(written[0][0])

    assert our_ch == ref_ch == 4   # two recorded voices × stereo
    n = min(len(our_data), len(ref_data))
    assert n > 0
    err = np.abs(our_data[:n].astype(int) - ref_data[:n].astype(int)).max()
    assert err <= 1, f"recorded PCM differs by {err} LSB"
