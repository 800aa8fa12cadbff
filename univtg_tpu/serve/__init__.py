from univtg_tpu.serve.pipeline import GroundingPipeline, PreparedVideo  # noqa: F401
from univtg_tpu.serve.server import GroundingServer  # noqa: F401
