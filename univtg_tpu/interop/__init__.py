from univtg_tpu.interop.torch_ckpt import (  # noqa: F401
    config_from_reference_opt,
    load_reference_run,
    load_torch_checkpoint,
    params_from_torch_state_dict,
)
