#!/usr/bin/env python3
"""Per-script DSP feature usage across the corpus (informs the fused
engine's static specialization)."""

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

REF = pathlib.Path("/root/reference")
SECONDS = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0


def main():
    from skred_tpu import config as C
    from skred_tpu.assets import WaveBank
    from skred_tpu.host.timeline import compile_script
    from skred_tpu.parallel.batch import pack_stacked, stack_timelines

    bank = WaveBank()
    for p in sorted(REF.glob("*.sk")):
        tl = compile_script(p.read_text().splitlines(), SECONDS, bank=bank,
                            script_dir=REF)
        if tl.fused_passes is None:
            print(f"{p.name:10s} COMPAT (cyclic)")
            continue
        st = pack_stacked(stack_timelines([tl]))
        pp = st.params
        vp = pp["amp"].shape[-1]
        f = []
        if ((pp["freq_mod_osc"] >= 0) & (pp["fm_self"] == 0)).any():
            f.append("fm")
        if (pp["cz_mode"] != 0).any():
            f.append("cz")
        if (pp["amp_mod_osc"] >= 0).any():
            f.append("am")
        if ((pp["pan_mod_osc"] >= 0) & (pp["disconnect"] == 0)).any():
            f.append("pm")
        if (pp["use_amp_envelope"] != 0).any():
            f.append("env")
        if (pp["filter_mode"] != 0).any():
            f.append("flt")
        if (pp["hold_max"] != 0).any():
            f.append("hold")
        if (pp["quantize"] != 0).any():
            f.append("quant")
        if (pp["one_shot"] != 0).any():
            f.append("oneshot")
        if (pp["table_index"] == C.WAVE_TABLE_NOISE_ALT).any():
            f.append("noise")
        if (pp["direction"] != 0).any():
            f.append("dir")
        if ((pp["loop_enabled"] != 0) & (pp["loop_valid"] != 0)).any():
            f.append("loop")
        med = "med_map" in pp
        big = "big_map" in pp
        print(f"{p.name:10s} vp={vp:3d} passes={tl.fused_passes} "
              f"src={st.n_src} med={int(med)} big={int(big)} "
              f"segs={pp['amp'].shape[1]:4d}  {','.join(f)}")


if __name__ == "__main__":
    main()
