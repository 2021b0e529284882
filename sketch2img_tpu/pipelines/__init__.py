from sketch2img_tpu.pipelines.text2img import make_text2img_fn, latents_to_image
from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn
from sketch2img_tpu.pipelines.attn_injected import make_attn_injected_fn

__all__ = [
    "make_text2img_fn",
    "latents_to_image",
    "make_sketch_guided_fn",
    "make_attn_injected_fn",
]
