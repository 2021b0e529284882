"""CLIP text encoder (ViT-L/14 text tower) — conditioning for the SD UNet.

Reference usage: encode_tokens with >77-token chunked encoding and
final_layer_norm-of-last-hidden-state (/root/reference/trainer.py:46-72),
plus the standard CFG prompt-pair encode inside the pipeline
(modules/pipeline.py:55-57).

TPU-first: fixed 77-token sequences (chunking pads to full windows so shapes
stay static under jit), fp32 LayerNorm/softmax, bf16 matmuls via policy.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from sketch2img_tpu.models.layers import LayerNorm
from sketch2img_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    intermediate_size: int = 3072
    bos_token_id: int = 49406
    eos_token_id: int = 49407


SD15_TEXT_CONFIG = CLIPTextConfig()


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.config
        q = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="v_proj")(x)
        out = multi_head_attention(q, k, v, c.num_heads, mask=mask)
        return nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.config
        h = LayerNorm(name="layer_norm1")(x)
        x = x + CLIPAttention(c, self.compute_dtype, name="self_attn")(h, mask)
        h = LayerNorm(name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.compute_dtype, name="fc1")(h)
        h = _quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.compute_dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns final_layer_norm(last hidden state): (B, 77, 768).

    This matches both the reference's explicit
    ``final_layer_norm(hidden_states[-1])`` (trainer.py:68-70) and the
    pipeline's ``text_encoder(ids)[0]`` — identical quantities.
    """

    config: CLIPTextConfig = SD15_TEXT_CONFIG
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        b, n = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.compute_dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_length, c.hidden_size),
        )
        x = tok + pos[None, :n, :].astype(tok.dtype)

        # causal mask (CLIP text is autoregressive-masked)
        causal = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)
        mask = causal[None, None, :, :]

        for i in range(c.num_layers):
            x = CLIPLayer(c, self.compute_dtype, name=f"layer_{i}")(x, mask)
        return LayerNorm(name="final_layer_norm")(x)


# ---------------------------------------------------------------------------
# >77-token chunked encoding (trainer.py:46-72)
# ---------------------------------------------------------------------------


def chunk_input_ids(
    input_ids: Sequence[Sequence[int]],
    bos_token_id: int = 49406,
    eos_token_id: int = 49407,
) -> List[np.ndarray]:
    """Host-side re-statement of encode_tokens' chunking (trainer.py:48-61).

    Splits unpadded id lists into 75-token windows, re-wrapping each in
    BOS/EOS; exhausted rows are filled with 75 EOS tokens. Returns a list of
    (B, 77) arrays — a data-dependent count, so this runs on host and the
    jit'd encoder is applied per chunk (static shape).
    """
    rows = [list(x) for x in input_ids]
    if max(map(len, rows)) <= 77:
        width = max(map(len, rows))
        out = np.full((len(rows), width), eos_token_id, dtype=np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return [out]

    chunks: List[np.ndarray] = []
    while max(map(len, rows)) != 0:
        window = []
        for r in rows:
            body = r[:75] if len(r) > 0 else [eos_token_id] * 75
            window.append([bos_token_id] + list(body) + [eos_token_id])
        rows = [r[75:] for r in rows]
        width = max(map(len, window))
        arr = np.full((len(window), width), eos_token_id, dtype=np.int32)
        for i, r in enumerate(window):
            arr[i, : len(r)] = r
        chunks.append(arr)
    return chunks


def encode_tokens(apply_fn, input_ids: Sequence[Sequence[int]]) -> jnp.ndarray:
    """Chunked text encode: concat per-chunk hidden states on the token axis
    (trainer.py:66-72). ``apply_fn(ids) -> (B, n, 768)`` is the jit'd encoder."""
    chunks = chunk_input_ids(input_ids)
    states = [apply_fn(jnp.asarray(c)) for c in chunks]
    return states[0] if len(states) == 1 else jnp.concatenate(states, axis=-2)


# ---------------------------------------------------------------------------
# torch -> flax conversion (CLIPTextModel state dict)
# ---------------------------------------------------------------------------


def convert_torch_clip_text(state_dict, num_layers: int = 12) -> dict:
    import numpy as np

    def arr(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def maybe(k, tries):
        for t in tries:
            if t in state_dict:
                return t
        raise KeyError(k)

    p = "text_model." if any(k.startswith("text_model.") for k in state_dict) else ""
    params = {
        "token_embedding": {"embedding": arr(f"{p}embeddings.token_embedding.weight")},
        "position_embedding": arr(f"{p}embeddings.position_embedding.weight"),
        "final_layer_norm": {
            "LayerNorm_0": {
                "scale": arr(f"{p}final_layer_norm.weight"),
                "bias": arr(f"{p}final_layer_norm.bias"),
            }
        },
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}."
        layer = {
            "layer_norm1": {"LayerNorm_0": {"scale": arr(lp + "layer_norm1.weight"),
                                            "bias": arr(lp + "layer_norm1.bias")}},
            "layer_norm2": {"LayerNorm_0": {"scale": arr(lp + "layer_norm2.weight"),
                                            "bias": arr(lp + "layer_norm2.bias")}},
            "self_attn": {
                name: {"kernel": arr(lp + f"self_attn.{name}.weight").T,
                       "bias": arr(lp + f"self_attn.{name}.bias")}
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "fc1": {"kernel": arr(lp + "mlp.fc1.weight").T, "bias": arr(lp + "mlp.fc1.bias")},
            "fc2": {"kernel": arr(lp + "mlp.fc2.weight").T, "bias": arr(lp + "mlp.fc2.bias")},
        }
        params[f"layer_{i}"] = layer
    return params
