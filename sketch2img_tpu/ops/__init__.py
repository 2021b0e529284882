from sketch2img_tpu.ops.attention import multi_head_attention, set_default_attention_backend
from sketch2img_tpu.ops.resize import resize_bilinear

__all__ = ["multi_head_attention", "set_default_attention_backend", "resize_bilinear"]
