"""Parser parity tests: the Python skode port must produce byte-identical
event transcripts to the reference parser (via golden/skode_oracle)."""

import math
import subprocess

import pytest

from skred_tpu.lang import skode as sk


def _fmt(x: float) -> str:
    return "%.17g" % x


def transcript(lines) -> str:
    """Produce the same transcript format as golden/skode_oracle.c."""
    out = []

    def cb(s: sk.Skode, info: int) -> int:
        if info == sk.FUNCTION:
            out.append("F %s [%s ]" % (s.atom, "".join(" " + _fmt(a) for a in s.args())))
            if s.atom == "=___" and s.arg_len > 1:
                n = int(s.arg[0])
                if 0 <= n <= 9:
                    s.set_local(n, s.arg[1])
        elif info == sk.DEFER:
            out.append("D %s %s '%s'" % (s.defer_mode, _fmt(s.defer_num), s.defer_string))
        elif info == sk.CHUNK_END:
            out.append("C")
        elif info == sk.GOT_STRING:
            out.append("S '%s'" % s.string)
        elif info == sk.GOT_ARRAY:
            out.append("A [%s ]" % "".join(" " + _fmt(d) for d in s.data))
        elif info == sk.PUSH:
            out.append("P")
        elif info == sk.POP:
            out.append("O")
        else:
            out.append("U %d" % info)
        return 0

    p = sk.Skode(cb)
    g = [0.0] * 10
    p.set_global(g)
    for line in lines:
        p.feed(line)
    return "\n".join(out) + "\n" if out else ""


def oracle_transcript(exe, lines) -> str:
    r = subprocess.run(
        [str(exe)], input="\n".join(lines) + "\n", capture_output=True, text=True
    )
    return r.stdout


CASES = [
    ["v0 w0 f440 a4 F1,10"],
    ["v1 w0 f1 a50 m1"],
    ["S100"],
    ["v4w110/a10T"],
    ["v2T v3T v2T ~.1 T ~.1 T"],
    ["+2 Z1 v0m0 +2 v3m0 +2 v4m0 +2 v5m0 +9 v15a0 v15m0 # intro"],
    ["{v21T}x0", "{v20T}x1", "Z1"],
    ["{ v0T +.33v0T +.33v0T } x0"],
    ["=0,50", "v12n$0l1", "=0,40", "v12n$0l1"],
    ["y0 %4", "{v1 m0 v0 m0 l1 n27} x0", "{#} x-", "{v0 l1 n27} x-"],
    ["f", "-1", "{hello", "world}", "(1 2 3 4 5", "-1.5 1e-5", "1 2 3", "100", ")"],
    ["a; b; c"],
    ["# pure comment"],
    ["v0 l>g 3 g>l 2"],
    ["[v0n45T]"],
    ["(0x10 0xff -0.5)"],
    ["x-"],
    ["1 2 3 4 5 6 7 8 9 10 q"],   # arg stack overflow (cap 8)
    ["longatomname 5"],            # atom truncation to 4 chars
    ["~.5", "V1", "M120"],
    ["v0 w1 f55 a4 J1 K1000 Q0.707 F1,100"],
    [":w24,200 v0 a20 w200 B1T"],
    ["m1 v0 w0 f220 a4 l0 J1 K1821.18 Q97.87 c1,0.8318 t0.01,0.1,0.1,0.25 l1 l0 v0 m0"],
    ["v0 ; +1 x +2 y ; v1"],
    ["+.5~.25 a +3 b"],            # mixed-mode defer chain (mode quirk)
    ["..5 -.5 .", "- e"],          # strtod edge cases
    ["$0 $1 q $$ 5"],
]


def test_against_oracle(skode_oracle):
    for case in CASES:
        got = transcript(case)
        want = oracle_transcript(skode_oracle, case)
        assert got == want, f"case {case!r}:\nGOT:\n{got}\nWANT:\n{want}"


def test_corpus_against_oracle(skode_oracle, reference_dir):
    """Every bundled .sk script parses identically to the reference parser."""
    for f in sorted(reference_dir.glob("*.sk")):
        lines = f.read_text().splitlines()
        got = transcript(lines)
        want = oracle_transcript(skode_oracle, lines)
        assert got == want, f"{f.name}:\nGOT:\n{got[:2000]}\nWANT:\n{want[:2000]}"
    # easy.txt is a defer-based song arrangement
    lines = (reference_dir / "easy.txt").read_text().splitlines()
    assert transcript(lines) == oracle_transcript(skode_oracle, lines)


def test_strtod():
    assert sk.skode_strtod("-") != sk.skode_strtod("-")  # NaN
    assert math.isnan(sk.skode_strtod("."))
    assert math.isnan(sk.skode_strtod("e"))
    assert sk.skode_strtod("1e-5") == 1e-5
    assert sk.skode_strtod("0x10") == 16.0
    assert sk.skode_strtod("--5") == 0.0
    assert sk.skode_strtod("4.2.3") == 4.2


def test_atom_packing():
    got = transcript(["abcdefg 1"])
    assert got.splitlines()[0].startswith("F abcd")
