from univtg_tpu.data.mr import MRDataset  # noqa: F401
from univtg_tpu.data.collate import collate_mr  # noqa: F401
from univtg_tpu.data.loader import Loader  # noqa: F401
