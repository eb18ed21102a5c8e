#!/usr/bin/env python3
"""Does Mosaic contract ``a*b+c`` into a correctly-rounded hardware fma?

If YES (bitwise equal to the software TwoProduct+TwoSum _kfma over
adversarial inputs), the fused engine's exact mode can use the plain
expression in Pallas kernels — the ~25-op software chain is the FLOP
hog of the serial filter/smoother kernel (see parallel/roofline.py).

Prints one line: CONTRACTED / NOT-CONTRACTED / MIXED.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from skred_tpu.engine.kernels import _kfma

F32 = jnp.float32


def _probe_kernel(a_ref, b_ref, c_ref, hw_ref, sw_ref):
    a, b, c = a_ref[...], b_ref[...], c_ref[...]
    hw_ref[...] = a * b + c
    sw_ref[...] = _kfma(a, b, c)


def main():
    rng = np.random.default_rng(7)
    n = 1 << 20
    # adversarial: magnitudes spanning ulp-cancellation territory
    def rand(scale):
        m = rng.normal(size=n) * np.exp(rng.uniform(-scale, scale, n))
        return m.astype(np.float32)

    a = rand(20)
    b = rand(20)
    c = np.where(rng.uniform(size=n) < 0.5, -(a * b).astype(np.float32),
                 rand(20)).astype(np.float32)   # half the c's cancel a*b
    A = jnp.asarray(a.reshape(-1, 128))
    B = jnp.asarray(b.reshape(-1, 128))
    Cc = jnp.asarray(c.reshape(-1, 128))
    rows = A.shape[0]
    blk = pl.BlockSpec((256, 128), lambda i: (i, i * 0))
    hw, sw = pl.pallas_call(
        _probe_kernel,
        grid=(rows // 256,),
        in_specs=[blk, blk, blk],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct(A.shape, F32)] * 2,
    )(A, B, Cc)
    hw = np.asarray(hw).ravel()
    sw = np.asarray(sw).ravel()
    # the software chain (validated vs glibc fmaf in the test suite) is
    # the oracle; report hw-vs-sw directly.
    neq = np.count_nonzero(hw.view(np.int32) != sw.view(np.int32))
    plain = np.float32(a * b) + c   # two-rounding result
    neq_plain = np.count_nonzero(sw.view(np.int32)
                                 != plain.view(np.int32))
    print(f"hw-vs-sw mismatches: {neq}/{n}  "
          f"(sw-vs-two-rounding: {neq_plain} — sanity, should be >0)")
    print("CONTRACTED" if neq == 0 else
          "NOT-CONTRACTED" if neq_plain and neq >= neq_plain // 2 else "MIXED")


if __name__ == "__main__":
    main()
