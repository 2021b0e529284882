"""CLIP vision encoder (ViT-L/14) — sketch conditioning for the
attention-injection variant.

Reference usage: CLIPVisionModel.last_hidden_state feeds SatMixin.set_state
(/root/reference/modules/clip_guided_trainer.py:105,214,
clip_guided_inf.py:100-107). Note HF's ``last_hidden_state`` is the encoder
output *before* post_layernorm — preserved here.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn

from sketch2img_tpu.models.layers import LayerNorm
from sketch2img_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096


VIT_L14_CONFIG = CLIPVisionConfig()


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class _Layer(nn.Module):
    config: CLIPVisionConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        h = LayerNorm(name="layer_norm1")(x)
        q = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="q_proj")(h)
        k = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="k_proj")(h)
        v = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="v_proj")(h)
        attn = multi_head_attention(q, k, v, c.num_heads)
        x = x + nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="out_proj")(attn)
        h = LayerNorm(name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.compute_dtype, name="fc1")(h)
        h = _quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="fc2")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    """pixel_values (B, H, W, 3), CLIP-normalized -> last_hidden_state
    (B, 1 + (H/p)*(W/p), hidden) — pre-post_layernorm, HF parity."""

    config: CLIPVisionConfig = VIT_L14_CONFIG
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.compute_dtype,
            name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(patches.dtype), (b, 1, c.hidden_size)), patches],
            axis=1,
        )
        n = x.shape[1]
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            ((c.image_size // c.patch_size) ** 2 + 1, c.hidden_size),
        )
        x = x + pos[None, :n, :].astype(x.dtype)
        x = LayerNorm(name="pre_layrnorm")(x)  # HF's (sic) spelling
        for i in range(c.num_layers):
            x = _Layer(c, self.compute_dtype, name=f"layer_{i}")(x)
        return x


def convert_torch_clip_vision(state_dict, num_layers: int = 24) -> dict:
    import numpy as np

    def arr(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    p = "vision_model." if any(k.startswith("vision_model.") for k in state_dict) else ""
    params = {
        "patch_embedding": {
            # torch conv (O,I,kh,kw) -> flax (kh,kw,I,O)
            "kernel": arr(f"{p}embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)
        },
        "class_embedding": arr(f"{p}embeddings.class_embedding"),
        "position_embedding": arr(f"{p}embeddings.position_embedding.weight"),
        "pre_layrnorm": {"LayerNorm_0": {"scale": arr(f"{p}pre_layrnorm.weight"),
                                         "bias": arr(f"{p}pre_layrnorm.bias")}},
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}."
        layer = {
            "layer_norm1": {"LayerNorm_0": {"scale": arr(lp + "layer_norm1.weight"),
                                            "bias": arr(lp + "layer_norm1.bias")}},
            "layer_norm2": {"LayerNorm_0": {"scale": arr(lp + "layer_norm2.weight"),
                                            "bias": arr(lp + "layer_norm2.bias")}},
            "fc1": {"kernel": arr(lp + "mlp.fc1.weight").T, "bias": arr(lp + "mlp.fc1.bias")},
            "fc2": {"kernel": arr(lp + "mlp.fc2.weight").T, "bias": arr(lp + "mlp.fc2.bias")},
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            layer[name] = {
                "kernel": arr(lp + f"self_attn.{name}.weight").T,
                "bias": arr(lp + f"self_attn.{name}.bias"),
            }
        params[f"layer_{i}"] = layer
    return params
