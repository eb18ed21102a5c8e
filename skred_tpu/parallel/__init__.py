from skred_tpu.parallel.batch import stack_timelines, render_stacked, render_batch  # noqa: F401
