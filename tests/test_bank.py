"""Wave bank parity: every built-in slot must be bit-identical to the
reference engine's wavetable dump (golden/render_golden -W)."""

import struct
import subprocess

import numpy as np
import pytest

from skred_tpu.assets import WaveBank


@pytest.fixture(scope="session")
def wavedump(tmp_path_factory, reference_dir):
    from tests.conftest import REPO

    exe = REPO / "golden" / "build" / "render_golden"
    if not exe.exists():
        subprocess.run([str(REPO / "golden" / "build.sh")], check=True)
    out = tmp_path_factory.mktemp("golden") / "wavedump.bin"
    subprocess.run([str(exe), "-W", str(out)], cwd=reference_dir, check=True,
                   capture_output=True)
    slots = {}
    data = out.read_bytes()
    pos = 0
    while True:
        (slot,) = struct.unpack_from("<i", data, pos)
        pos += 4
        if slot < 0:
            break
        size, rate, one_shot, loop_en, ls, le, midi, ohz = struct.unpack_from(
            "<ifiiiiff", data, pos
        )
        pos += 32
        tab = np.frombuffer(data, dtype=np.float32, count=size, offset=pos)
        pos += 4 * size
        slots[slot] = dict(size=size, rate=rate, one_shot=one_shot,
                           loop_enabled=loop_en, loop_start=ls, loop_end=le,
                           midi_note=midi, offset_hz=ohz, data=tab)
    return slots


def test_bank_bit_exact(wavedump):
    bank = WaveBank()
    ours = {i for i, s in enumerate(bank.slots) if s.valid}
    theirs = set(wavedump)
    assert ours == theirs, f"slot sets differ: only-ours={ours-theirs} only-ref={theirs-ours}"
    for i in sorted(theirs):
        ref = wavedump[i]
        s = bank.slots[i]
        assert s.size == ref["size"], f"slot {i} size"
        assert s.rate == ref["rate"], f"slot {i} rate"
        assert s.one_shot == ref["one_shot"], f"slot {i} one_shot"
        assert s.loop_enabled == ref["loop_enabled"], f"slot {i} loop_enabled"
        assert s.loop_start == ref["loop_start"], f"slot {i} loop_start"
        assert s.loop_end == ref["loop_end"], f"slot {i} loop_end"
        assert np.float32(s.midi_note) == np.float32(ref["midi_note"]), f"slot {i} midi"
        assert np.float32(s.offset_hz) == np.float32(ref["offset_hz"]), (
            f"slot {i} offset_hz {s.offset_hz} vs {ref['offset_hz']}"
        )
        same = np.array_equal(s.data[: s.size], ref["data"])
        if not same:
            d = np.abs(s.data[: s.size] - ref["data"])
            raise AssertionError(
                f"slot {i} data differs: maxabs {d.max()} at {d.argmax()} "
                f"({s.data[d.argmax()]} vs {ref['data'][d.argmax()]})"
            )


def test_wav_user_slot(reference_dir):
    bank = WaveBank()
    ok = bank.load_wav(24, 200, search_dir=reference_dir)
    assert ok
    s = bank.slots[200]
    assert s.valid and s.one_shot == 1 and s.loop_start == 1
    assert s.size > 0 and s.rate > 0


def test_pack():
    bank = WaveBank()
    pb = bank.pack()
    assert pb.buffer.dtype == np.float32
    # slot 0 (sine) is first in the packed buffer
    assert pb.offsets[0] == 0 and pb.sizes[0] == 4096
    assert np.array_equal(pb.buffer[:4096], bank.slots[0].data)
    # korg slot
    k = 32
    o = pb.offsets[k]
    assert np.array_equal(pb.buffer[o : o + 2048], bank.slots[k].data)
