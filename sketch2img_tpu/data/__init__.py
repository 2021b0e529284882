from sketch2img_tpu.data.dataset import ImageStore
from sketch2img_tpu.data.tags import process_tags
from sketch2img_tpu.data.loader import Loader

__all__ = ["ImageStore", "process_tags", "Loader"]
