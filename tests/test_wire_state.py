"""Wire/state-model parity: executing each .sk script through the host
model must produce the identical state dump as the reference engine
(golden/render_golden -S)."""

import subprocess

import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.host import HostEngine, WireContext
from skred_tpu.host.format import state_dump
from tests.conftest import REPO


@pytest.fixture(scope="session")
def renderer(reference_dir):
    exe = REPO / "golden" / "build" / "render_golden"
    subprocess.run([str(REPO / "golden" / "build.sh")], check=True,
                   capture_output=True)
    return exe


@pytest.fixture(scope="session")
def session_bank():
    return WaveBank()


def ref_dump(renderer, reference_dir, script: str) -> str:
    r = subprocess.run([str(renderer), "-S", script], cwd=reference_dir,
                       capture_output=True, text=True, check=True)
    # strip init chatter ('# ...' lines from wave_table_init / wire output)
    lines = [l for l in r.stdout.splitlines()
             if l.startswith(("V", "TEMPO", "PAT", "CELL", "QUEUED"))]
    return "\n".join(lines) + "\n"


def our_dump(bank, reference_dir, script: str) -> str:
    engine = HostEngine(bank.fork())
    ctx = WireContext(engine, script_dir=reference_dir)
    for line in (reference_dir / script).read_text().splitlines():
        ctx.wire(line)
    return state_dump(engine)


ALL_SCRIPTS = sorted(
    p.name for p in __import__("pathlib").Path("/root/reference").glob("*.sk")
) if __import__("pathlib").Path("/root/reference").exists() else []


@pytest.mark.parametrize("script", ALL_SCRIPTS)
def test_state_parity(renderer, reference_dir, session_bank, script):
    want = ref_dump(renderer, reference_dir, script)
    got = our_dump(session_bank, reference_dir, script)
    if got != want:
        import difflib
        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), got.splitlines(), "ref", "ours", lineterm=""))
        raise AssertionError(f"{script} state dump differs:\n{diff[:4000]}")
