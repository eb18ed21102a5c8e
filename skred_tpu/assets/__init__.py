from skred_tpu.assets.bank import WaveBank, PackedBank  # noqa: F401
