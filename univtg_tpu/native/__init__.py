from univtg_tpu.native.build import load_ap_kernel  # noqa: F401
