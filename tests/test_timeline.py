"""Timeline-compiler parity: simulating the control plane (sequencer +
defer queue) for N seconds must leave the identical engine state as the
reference rendering the same duration (render_golden -R)."""

import subprocess

import pytest

from skred_tpu.host.format import state_dump
from skred_tpu.host.timeline import compile_script
from tests.conftest import REPO

SECONDS = 5.0

# scripts exercising the sequencer, defers, variables, tempo, links
SEQ_SCRIPTS = ["24.sk", "64.sk", "75.sk", "909.sk", "12.sk", "13.sk", "22.sk",
               "30.sk", "68.sk", "69.sk", "70.sk", "71.sk", "4.sk", "10.sk",
               "0.sk", "33.sk", "41.sk", "72.sk"]


@pytest.fixture(scope="session")
def renderer(reference_dir):
    exe = REPO / "golden" / "build" / "render_golden"
    subprocess.run([str(REPO / "golden" / "build.sh")], check=True,
                   capture_output=True)
    return exe


def ref_post_state(renderer, reference_dir, script, seconds):
    r = subprocess.run(
        [str(renderer), "-R", "-d", str(seconds), script],
        cwd=reference_dir, capture_output=True, text=True, check=True)
    lines = [l for l in r.stdout.splitlines()
             if l.startswith(("V", "TEMPO", "PAT", "CELL", "QUEUED", "SAMPLE_COUNT"))]
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("script", SEQ_SCRIPTS)
def test_timeline_state_parity(renderer, reference_dir, script):
    want = ref_post_state(renderer, reference_dir, script, SECONDS)
    tl = compile_script(
        (reference_dir / script).read_text().splitlines(), SECONDS,
        script_dir=reference_dir)
    e = tl.final_engine
    got = "SAMPLE_COUNT %d\n" % e.sample_count + state_dump(e)
    if got != want:
        import difflib
        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), got.splitlines(), "ref", "ours", lineterm=""))
        raise AssertionError(f"{script} post-render state differs:\n{diff[:4000]}")


def test_segments_basic(reference_dir):
    tl = compile_script(
        (reference_dir / "0.sk").read_text().splitlines(), 2.0,
        script_dir=reference_dir)
    assert tl.num_blocks == 173  # ceil(2*44100/512)
    # 0.sk has no sequencer: exactly one segment
    assert tl.num_segments == 1
    assert tl.mod_passes == 1    # v0's modulator is v1 (higher index)
    p = tl.params
    assert p["amp"][0, 0] == 4.0 and p["amp"][0, 1] == 50.0
    assert p["freq_mod_osc"][0, 0] == 1 and p["disconnect"][0, 1] == 1


def test_segments_sequencer(reference_dir):
    tl = compile_script(
        (reference_dir / "24.sk").read_text().splitlines(), 5.0,
        script_dir=reference_dir)
    # M120 → steps every 0.125s → many segments
    assert tl.num_segments > 10
    assert tl.seg_is_start.sum() == tl.num_segments


def test_mod_passes_increasing_chain(reference_dir):
    # 3.sk: v0 F3,1 / v1 F3,1 / v2 F3,1 — modulator v3 is higher: 1 pass.
    tl = compile_script(["v0 w0 a1 F3,1", "v3 w0 a1"], 0.1,
                        script_dir=reference_dir)
    assert tl.mod_passes == 1
    # increasing chain: v5 reads v2 (lower), v2 reads v1, v1 reads v0
    tl = compile_script(["v1 w0 a1 F0,1", "v2 w0 a1 F1,1", "v5 w0 a1 F2,1"],
                        0.1, script_dir=reference_dir)
    assert tl.mod_passes == 4
