from univtg_tpu.extract.clip.model import CLIP, CLIPConfig  # noqa: F401
from univtg_tpu.extract.clip.tokenizer import tokenize  # noqa: F401
