from sketch2img_tpu.models.lgp import LatentEdgePredictor
from sketch2img_tpu.models.anime2sketch import UnetGenerator, create_anime2sketch
from sketch2img_tpu.models.vae import AutoencoderKL
from sketch2img_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig
from sketch2img_tpu.models.clip_vision import CLIPVisionEncoder, CLIPVisionConfig
from sketch2img_tpu.models.unet import UNet2DCondition, UNetConfig, SD15_CONFIG, TAP_NAMES

__all__ = [
    "LatentEdgePredictor",
    "UnetGenerator",
    "create_anime2sketch",
    "AutoencoderKL",
    "CLIPTextEncoder",
    "CLIPTextConfig",
    "CLIPVisionEncoder",
    "CLIPVisionConfig",
    "UNet2DCondition",
    "UNetConfig",
    "SD15_CONFIG",
    "TAP_NAMES",
]
