"""Observability — the reference's runtime introspection surface.

  * ``/s`` system dump: threads/udp/voices/sample count + callback stats
    (wire.c:236-261, 783-794) → here: engine/system/render stats
  * ``/S`` queue + session dump (wire.c:245-261, show_stats)
  * ``W``  wavetable stats + preview (wire.c:521-551 wavetable_show,
    downsample_block_average_min_max :468-507)
  * the perf event firehose (mpsc_queue.h + wire.c:29-60) → a plain
    in-process event log of every dispatched wire line
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np

from skred_tpu import config as C


class EventLog:
    """Offline analog of the MPSC perf queue: wire lines with timestamps
    (host wall clock + engine sample count)."""

    def __init__(self, capacity: int = 65536):
        self.capacity = capacity
        self.items: List[Tuple[float, int, str]] = []

    def send(self, sample_count: int, line: str) -> None:
        if len(self.items) >= self.capacity:
            self.items.pop(0)
        self.items.append((time.time(), sample_count, line))

    def drain(self) -> List[Tuple[float, int, str]]:
        out = self.items
        self.items = []
        return out


def system_show(engine) -> str:
    """'/s' analog (wire.c:236-243 + audio_show :941-958)."""
    lines = ["# skred_tpu offline engine"]
    lines.append("# synth total voice count %d" % C.VOICE_MAX)
    active = int((engine.amp != 0).sum())
    lines.append("# synth active voice count %d" % active)
    lines.append("# synth sample count %d" % engine.sample_count)
    lines.append("# tempo %g bpm (time/step %g s)"
                 % (float(engine.tempo_bpm), float(engine.tempo_time_per_step)))
    running = [p for p in range(C.PATTERNS_MAX)
               if engine.seq_state[p] == C.SEQ_RUNNING]
    lines.append("# patterns running: %s" % (running or "none"))
    return "\n".join(lines)


def queue_show(engine) -> str:
    """'/S' analog (show_stats, wire.c:245-261)."""
    lines = ["# rec_state : %d rec_ptr %d" % (engine.rec_state, engine.rec_ptr)]
    for q in range(C.QUEUE_SIZE):
        if engine.queue_state[q] != C.Q_FREE:
            lines.append("# [%d] (%d) @%d {%s}" % (
                q, engine.queue_state[q], int(engine.queue_when[q]),
                engine.queue_what[q]))
    return "\n".join(lines)


def downsample_min_max(source: np.ndarray, dest_len: int):
    """reference wire.c:468-507 — block average with min/max envelope."""
    source = np.asarray(source, dtype=np.float32)
    n = source.size
    if dest_len >= n:
        pad = np.zeros(dest_len, np.float32)
        pad[:n] = source
        return pad[:n], pad[:n].copy(), pad[:n].copy()
    block = n / dest_len
    avg = np.empty(dest_len, np.float32)
    mn = np.empty(dest_len, np.float32)
    mx = np.empty(dest_len, np.float32)
    for i in range(dest_len):
        s = int(i * block)
        e = min(int((i + 1) * block), n - 1)
        seg = source[s : e + 1]
        avg[i] = seg.mean()
        mn[i] = seg.min()
        mx[i] = seg.max()
    return avg, mn, mx


def wavetable_show(bank, n: int, preview: Optional[int] = None) -> str:
    """'W' analog (wavetable_show, wire.c:521-551)."""
    if not (0 <= n < C.WAVE_TABLE_MAX):
        return ""
    s = bank.slots[n]
    if not s.valid:
        return ""
    table = s.data[: s.size]
    crossing = int(((table[:-1] > 0) & (table[1:] < 0)
                    | (table[:-1] < 0) & (table[1:] > 0)).sum())
    out = ["# w%d size:%d +hz:%g midi:%g min:%g max:%g zerocross:%d"
           % (n, s.size, s.offset_hz, s.midi_note,
              float(table.min()), float(table.max()), crossing)]
    return "\n".join(out)


def scope_dump(audio: np.ndarray, path, width: int = 800) -> None:
    """Offline scope: write the downsampled min/avg/max envelope of a
    rendered stereo stream (the scope_buffer_t analog, scope-shared.h)
    as an .npz artifact for plotting."""
    audio = np.asarray(audio)
    left, right = audio[:, 0], audio[:, 1]
    la, lmn, lmx = downsample_min_max(left, width)
    ra, rmn, rmx = downsample_min_max(right, width)
    np.savez(path, left_avg=la, left_min=lmn, left_max=lmx,
             right_avg=ra, right_min=rmn, right_max=rmx,
             samples=len(audio), rate=C.MAIN_SAMPLE_RATE)
