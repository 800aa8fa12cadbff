from univtg_tpu.models.config import ModelConfig  # noqa: F401
from univtg_tpu.models.univtg import UniVTG  # noqa: F401
