from univtg_tpu.serve.pipeline import GroundingPipeline  # noqa: F401
