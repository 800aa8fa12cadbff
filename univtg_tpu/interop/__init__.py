from univtg_tpu.interop.torch_ckpt import (  # noqa: F401
    load_torch_checkpoint,
    params_from_torch_state_dict,
)
