"""skred_tpu — a TPU-native batch audio-synthesis framework.

A ground-up re-design of the capabilities of the `skred` real-time C
wavetable synthesizer (see /root/reference) as an offline, deterministic,
TPU-first batch renderer:

  * ``skred_tpu.lang``   — the "skode" streaming command-language parser and
    the "wire" command dispatch (reference: skode.c, wire.c).
  * ``skred_tpu.assets`` — wavetable/sample bank: procedural waves, Korg
    DW-8000 ROM banks, PCM one-shots, user WAV slots (reference: synth.c
    wave_table_init, retro/korg.h, amysamples.c, miniwav.c).
  * ``skred_tpu.host``   — host-side engine model + event-timeline compiler:
    scripts, the step sequencer and the deferred-event queue are simulated
    ahead of render into per-block parameter tensors (reference: seq.c,
    wire.c defer queue, synth.c setters).
  * ``skred_tpu.engine`` — the JAX/Pallas block renderer: all 64 voices
    advance in lockstep as a ``voices × block`` tensor, per-sample
    recurrences (phase, biquad, smoothers) carried by ``lax.scan``
    (reference: synth.c synth() hot loop).
  * ``skred_tpu.io``     — WAV read/write.
  * ``skred_tpu.parallel`` — batch/multi-chip sharding of script renders.

The renderer is deterministic: no audio callback, no threads, no races.
"""

__version__ = "0.1.0"

from skred_tpu.config import Config  # noqa: F401
