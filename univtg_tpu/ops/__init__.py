from univtg_tpu.ops.attention import multihead_attention  # noqa: F401
