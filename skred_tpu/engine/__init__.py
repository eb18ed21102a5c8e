from skred_tpu.engine.render import render_timeline  # noqa: F401
