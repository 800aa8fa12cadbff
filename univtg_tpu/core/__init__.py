from univtg_tpu.core import spans, nms, padding  # noqa: F401
