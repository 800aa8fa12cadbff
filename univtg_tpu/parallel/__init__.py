from univtg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate_params,
    replicate_tree,
    param_shardings,
)
from univtg_tpu.parallel.pipeline import (  # noqa: F401
    permute_pipeline_params,
    pipeline_layers,
)
