"""CLIP text/vision golden parity vs HuggingFace transformers (tiny random
configs — no downloads), plus the >77-token chunked encoding semantics of
trainer.py:46-72."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.models.clip_text import (  # noqa: E402
    CLIPTextConfig,
    CLIPTextEncoder,
    chunk_input_ids,
    convert_torch_clip_text,
    encode_tokens,
)
from sketch2img_tpu.models.clip_vision import (  # noqa: E402
    CLIPVisionConfig,
    CLIPVisionEncoder,
    convert_torch_clip_vision,
)


@pytest.fixture(scope="module")
def text_pair():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=77,
    )
    torch.manual_seed(0)
    golden = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, max_length=77,
    )
    params = convert_torch_clip_text(golden.state_dict(), num_layers=2)
    return golden, CLIPTextEncoder(cfg), params


def test_text_parity_last_hidden_state(text_pair):
    golden, enc, params = text_pair
    ids = torch.randint(0, 1000, (2, 77))
    with torch.no_grad():
        out = golden(ids, output_hidden_states=True)
        # reference quantity: final_layer_norm(hidden_states[-1]) == last_hidden_state
        want = golden.text_model.final_layer_norm(out.hidden_states[-1]).numpy()
        np.testing.assert_allclose(want, out.last_hidden_state.numpy(), atol=1e-6)

    got = jax.jit(functools.partial(enc.apply, {"params": params}))(jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_text_parity_short_sequence(text_pair):
    golden, enc, params = text_pair
    ids = torch.randint(0, 1000, (1, 12))
    with torch.no_grad():
        want = golden(ids).last_hidden_state.numpy()
    got = enc.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_chunk_input_ids_short():
    ids = [[1, 2, 3], [4, 5]]
    chunks = chunk_input_ids(ids, bos_token_id=0, eos_token_id=9)
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0], [[1, 2, 3], [4, 5, 9]])


def test_chunk_input_ids_long():
    # 100 tokens -> two windows: [bos + 75 + eos], [bos + 25 + eos]
    ids = [list(range(1, 101))]
    chunks = chunk_input_ids(ids, bos_token_id=0, eos_token_id=9)
    assert len(chunks) == 2
    assert chunks[0].shape == (1, 77)
    assert chunks[0][0, 0] == 0 and chunks[0][0, -1] == 9
    np.testing.assert_array_equal(chunks[0][0, 1:76], list(range(1, 76)))
    assert chunks[1][0, 0] == 0
    np.testing.assert_array_equal(chunks[1][0, 1:26], list(range(76, 101)))
    assert chunks[1][0, 26] == 9


def test_encode_tokens_concat(text_pair):
    _, enc, params = text_pair

    def apply_fn(ids):
        return enc.apply({"params": params}, ids)

    ids = [list(np.random.RandomState(0).randint(1, 999, size=100))]
    out = encode_tokens(apply_fn, ids)
    # reference keeps the tail chunk at its natural width (trainer.py:56):
    # 77 + (2 + 25) tokens on the concat axis
    assert out.shape == (1, 77 + 27, 32)


@pytest.fixture(scope="module")
def vision_pair():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
    )
    torch.manual_seed(1)
    golden = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4,
    )
    params = convert_torch_clip_vision(golden.state_dict(), num_layers=2)
    return golden, CLIPVisionEncoder(cfg), params


def test_vision_parity_last_hidden_state(vision_pair):
    golden, enc, params = vision_pair
    px = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = golden(px).last_hidden_state.numpy()  # pre-post_layernorm (HF)
    got = jax.jit(functools.partial(enc.apply, {"params": params}))(
        jnp.asarray(px.numpy().transpose(0, 2, 3, 1))
    )
    assert got.shape == (2, 1 + 16, 32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)
