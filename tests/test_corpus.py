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

# repo-local corpus extension (corpus/): capabilities the bundled corpus
# never exercises — feedback cycles (fb1/fb2) and the reference's full
# 64-voice design point (stress64)
CORPUS_DIR = REPO / "corpus"
EXTRA_SCRIPTS = sorted(p.name for p in CORPUS_DIR.glob("*.sk"))

# sequencer/defer-heavy scripts get a second, longer audio-parity tier:
# the 1.5 s gate misses late-onset behavior (pattern wrap beyond the
# first bars, long defer chains)
LONG_SECONDS = 5.0
LONG_SCRIPTS = ["24.sk", "64.sk", "909.sk", "48.sk", "74.sk"]


def _script_path(script: str) -> pathlib.Path:
    p = CORPUS_DIR / script
    return p if p.exists() else REFERENCE / script


def mint(script: str, seconds: float = SECONDS) -> np.ndarray:
    """Golden from the reference build, cached per (script, duration)."""
    out_dir = REPO / "golden" / "out"
    out_dir.mkdir(parents=True, exist_ok=True)
    f = out_dir / f"{script.replace('.sk', '')}_{seconds:g}.f32"
    if not f.exists():
        exe = REPO / "golden" / "build" / "render_golden"
        if not exe.exists():
            subprocess.run([str(REPO / "golden" / "build.sh")], check=True,
                           capture_output=True)
        subprocess.run([str(exe), "-d", str(seconds), "-o", str(f),
                        str(_script_path(script).resolve())],
                       cwd=REFERENCE, check=True, capture_output=True)
    return np.fromfile(f, dtype=np.float32).reshape(-1, 2)


@pytest.fixture(scope="module")
def corpus_bank():
    from skred_tpu.assets import WaveBank

    return WaveBank()


def _compile(script, corpus_bank, seconds=SECONDS):
    from skred_tpu.host.timeline import compile_script

    return compile_script(_script_path(script).read_text().splitlines(),
                          seconds, bank=corpus_bank, script_dir=REFERENCE)


def _check(out, golden, script, engine):
    n = min(len(out), len(golden))
    assert n > 0
    err = float(np.abs(out[:n] - golden[:n]).max())
    db = 20 * np.log10(err + 1e-30)
    assert db <= TARGET_DB, f"{script} ({engine}): {db:.1f} dB (err={err:.3e})"


@pytest.mark.corpus
@pytest.mark.parametrize("script", SCRIPTS + EXTRA_SCRIPTS)
def test_corpus_fused(script, corpus_bank):
    """Fused engine ≤ −60 dB vs the reference C render, whole corpus.

    The cyclic feedback scripts (corpus/fb*.sk) assert the OTHER
    direction: the fused grouping must route them to the compat scan
    engine (fused_passes None), and that engine must match the golden —
    the fallback is exercised, not just declared."""
    tl = _compile(script, corpus_bank)
    if tl.fused_passes is None:
        assert script.startswith("fb"), \
            f"{script}: unexpected cyclic modulation graph"
        from skred_tpu.engine import render_timeline

        _check(render_timeline(tl), mint(script), script, "compat-fallback")
        return
    assert not script.startswith("fb"), \
        f"{script}: feedback script NOT routed to the compat engine"
    from skred_tpu.engine.fused import render_fused
    from skred_tpu.parallel.batch import stack_timelines

    out = render_fused(stack_timelines([tl]))[0]
    _check(out, mint(script), script, "fused")


@pytest.mark.corpus
@pytest.mark.parametrize("script",
                         [s for s in SCRIPTS if s not in RENDER_PINNED]
                         + EXTRA_SCRIPTS)
def test_corpus_compat(script, corpus_bank):
    """Compat scan engine vs the reference, scripts test_render skips."""
    from skred_tpu.engine import render_timeline

    out = render_timeline(_compile(script, corpus_bank))
    _check(out, mint(script), script, "compat")


@pytest.mark.corpus
@pytest.mark.parametrize("script", LONG_SCRIPTS)
def test_corpus_fused_long(script, corpus_bank):
    """Second audio tier at 5 s for the sequencer/defer-heavy scripts:
    covers pattern wrap-at-empty beyond the first bars and late defer
    drains with audio parity, not just the 5 s state parity."""
    tl = _compile(script, corpus_bank, seconds=LONG_SECONDS)
    from skred_tpu.engine.fused import render_fused
    from skred_tpu.parallel.batch import stack_timelines

    out = render_fused(stack_timelines([tl]))[0]
    _check(out, mint(script, LONG_SECONDS), script, "fused@5s")


@pytest.mark.corpus
def test_corpus_batched_bench_shape(corpus_bank):
    """Replicated multi-row bucket through the bench's own entry path
    (fill_bucket → pack_stacked → pad_segments_pow2 → streamed chunks):
    every row of the replicated batch must match its script's golden —
    the replication/packing path is covered in CI, not just by hand."""
    from skred_tpu.engine.fused import _pad_quantum, render_fused_stream
    from skred_tpu.parallel.batch import (bucket_key, pack_stacked,
                                          pad_segments_pow2, stack_timelines)

    names = ["44.sk", "45.sk"]         # same bucket: 6 packed voices
    tls = [_compile(n, corpus_bank) for n in names]
    assert bucket_key(tls[0]) == bucket_key(tls[1]), \
        "test premise: both scripts share one specialization bucket"
    # replicated adjacent runs, like fill_bucket's layout but CI-sized
    rows = list(tls) + [tls[0]] * 15 + [tls[1]] * 15
    by_id = {id(t): n for t, n in zip(tls, names)}
    row_names = [by_id[id(t)] for t in rows]
    st = pack_stacked(stack_timelines(rows))
    per = _pad_quantum(st, st.params["amp"].shape[-1])
    pad_b = (-len(rows)) % max(per, 1)
    if pad_b:
        rows = rows + [rows[-1]] * pad_b
        row_names = row_names + [row_names[-1]] * pad_b
        st = pack_stacked(stack_timelines(rows))
    st = pad_segments_pow2(st)
    out = np.concatenate(list(render_fused_stream(st, 64)), axis=1)
    goldens = {n: mint(n) for n in names}
    for i, n in enumerate(row_names):
        _check(out[i], goldens[n], f"row{i}:{n}", "fused-batched")


@pytest.mark.corpus
def test_easy_song(corpus_bank):
    """The bundled defer-queue arrangement (/root/reference/easy.txt,
    driven live by easy.tcl) rendered end-to-end: tempo M240 brings the
    '+' defers (scaled by tempo_time_per_step*4, wire.c:875) into a
    12 s horizon covering intro, main and the Z0 outro stop.  Audio
    parity against the reference engine fed the identical lines."""
    seconds = 12.0
    lines = ["M240"] + (REFERENCE / "easy.txt").read_text().splitlines()
    out_dir = REPO / "golden" / "out"
    out_dir.mkdir(parents=True, exist_ok=True)
    f = out_dir / f"easy_M240_{seconds:g}.f32"
    if not f.exists():
        tmp = out_dir / "easy_M240.txt"
        tmp.write_text("\n".join(lines) + "\n")
        exe = REPO / "golden" / "build" / "render_golden"
        subprocess.run([str(exe), "-d", str(seconds), "-o",
                        str(f.resolve()), str(tmp.resolve())],
                       cwd=REFERENCE, check=True, capture_output=True)
    golden = np.fromfile(f, dtype=np.float32).reshape(-1, 2)
    from skred_tpu.engine.fused import render_fused
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import stack_timelines

    tl = compile_script(lines, seconds, bank=corpus_bank,
                        script_dir=REFERENCE)
    out = render_fused(stack_timelines([tl]))[0]
    _check(out, golden, "easy.txt", "fused")
