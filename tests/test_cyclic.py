"""Cyclic-graph Pallas engine vs the compat scan engine (the bit-exact
class vs the reference binary — tests/test_corpus.py asserts fb*.sk
compat parity against freshly minted C goldens, so equality here is
transitively reference parity).

Reference: /root/reference/synth.c:526-612 (serial frame loop),
:263-264 (CZ mod read without self-guard)."""

import pathlib

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")
CORPUS = pathlib.Path(__file__).resolve().parent.parent / "corpus"


@pytest.fixture(scope="module", autouse=True)
def _interpret():
    from skred_tpu.engine import kernels

    old = kernels.INTERPRET
    kernels.INTERPRET = True
    yield
    kernels.INTERPRET = old


@pytest.fixture(scope="module")
def bank():
    from skred_tpu.assets import WaveBank

    return WaveBank()


def _tl(name_or_lines, seconds, bank):
    from skred_tpu.host.timeline import compile_script

    lines = (CORPUS / name_or_lines).read_text().splitlines() \
        if isinstance(name_or_lines, str) else name_or_lines
    return compile_script(lines, seconds, bank=bank, script_dir=REF)


def _cyclic_vs_compat(tl, rows=(0, 1023)):
    from skred_tpu.engine import render_timeline
    from skred_tpu.engine.cyclic import render_cyclic
    from skred_tpu.parallel.batch import stack_timelines

    ref = np.asarray(render_timeline(tl))
    out = render_cyclic(stack_timelines([tl] * 1024))
    for row in rows:
        err = float(np.abs(out[row, : len(ref)] - ref).max())
        assert err == 0.0, f"row {row}: {err:.3e} vs compat"
    return out


@pytest.mark.parametrize("script", ["fb1.sk", "fb2.sk", "fb3.sk"])
def test_cyclic_bit_exact(script, bank):
    """Feedback corpus scripts: BIT-exact vs the compat engine at a
    1024-row replicated batch (mutual FM, FM/AM ring, CZ self-mod)."""
    tl = _tl(script, 0.25, bank)
    assert tl.fused_passes is None
    _cyclic_vs_compat(tl)


def test_cyclic_multi_segment(bank):
    """Mid-render param changes: segment gather, ops between blocks,
    per-block table-window rebasing (fb4-style, compressed waits)."""
    lines = [
        "v0 w1 f110 a100 F1,0.8 J200 K4000 Q30",
        "v1 w2 f55 a80 F0,0.5 ~.1 v0 f220 w2 v1 f70 a60 "
        "~.1 v0 f165 c1,0.4 C0,0.5 ~.1 v1 f52 a90",
    ]
    tl = _tl(lines, 0.45, bank)
    assert tl.fused_passes is None and tl.num_segments >= 3
    _cyclic_vs_compat(tl)


def test_cyclic_stream_state_carry(bank):
    """Chunked streaming == one-shot render (state carries bit-exactly
    across chunk boundaries, including the feedback taps)."""
    from skred_tpu.engine.cyclic import render_cyclic, render_cyclic_stream
    from skred_tpu.parallel.batch import stack_timelines

    tl = _tl("fb1.sk", 0.2, bank)
    st = stack_timelines([tl] * 1024)
    full = render_cyclic(st)
    chunks = np.concatenate(
        list(render_cyclic_stream(st, chunk_blocks=5, keep_rows=2)), axis=1)
    n = min(full.shape[1], chunks.shape[1])
    assert np.array_equal(full[:2, :n], chunks[:, :n])


def test_cyclic_big_table_bit_exact(bank):
    """fb5: feedback FM over a >32768-sample PCM table — the
    whole-table VMEM window (win_rows_for) renders it bit-exactly.
    Round 4's engine refused this class to the ~4x compat fallback;
    the reference C loop has no size cliff (synth.c:548-556)."""
    from skred_tpu.engine.cyclic import cyclic_gate, win_rows_for
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    tl = _tl("fb5.sk", 0.2, bank)
    assert tl.fused_passes is None
    st = pack_stacked(stack_timelines([tl] * 2), cyclic=True)
    assert cyclic_gate(st) is None, cyclic_gate(st)
    assert win_rows_for(st) > 256            # really beyond one slot
    _cyclic_vs_compat(tl)


def test_cyclic_gate_reasons(bank):
    """Every remaining eligibility refusal returns a reason string:
    VMEM window budget (synthetic giant table) and non-row-uniform
    table bindings (two different scripts in one cyclic stack)."""
    from skred_tpu.engine.cyclic import WIN_BUDGET_BYTES, cyclic_gate
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    tl = _tl("fb1.sk", 0.1, bank)
    st = pack_stacked(stack_timelines([tl] * 2), cyclic=True)
    assert cyclic_gate(st) is None
    st.params["table_size"] = (st.params["table_size"] * 0
                               + np.int32(WIN_BUDGET_BYTES))
    assert "VMEM" in (cyclic_gate(st) or "")

    lines2 = ["v0 w33 f110 a100 F1,0.8 J200 K4000 Q30",
              "v1 w2 f55 a80 F0,0.5 r1",
              "v2 w0 f220 a40 F2,1"]
    tl2 = _tl(lines2, 0.1, bank)
    st2 = pack_stacked(stack_timelines([tl, tl2]), cyclic=True)
    assert "differ across rows" in (cyclic_gate(st2) or "")


def test_render_batch_cyclic_routing(bank, tmp_path, monkeypatch, capsys):
    """render_batch routes eligible cyclic scripts through the Pallas
    engine; a gate refusal falls back to the compat scan WITH a loud
    per-script warning (the 1000x->4x cliff must not be silent), and
    both paths produce the bit-exact render."""
    import skred_tpu.engine.cyclic as cyc
    from skred_tpu.engine import render_timeline
    from skred_tpu.parallel.batch import render_batch

    p = tmp_path / "fb1.sk"
    p.write_text((CORPUS / "fb1.sk").read_text())
    ref = np.asarray(render_timeline(_tl("fb1.sk", 0.1, bank)))

    out = render_batch([p], 0.1)
    assert np.array_equal(out[0, :ref.shape[0]], ref)

    monkeypatch.setattr(cyc, "cyclic_gate", lambda st: "forced-refusal")
    out2 = render_batch([p], 0.1)
    err = capsys.readouterr().err
    assert "WARNING" in err and "forced-refusal" in err
    assert np.array_equal(out2[0, :ref.shape[0]], ref)
