"""Native CLIP BPE tokenizer vs transformers.CLIPTokenizer — id-level parity.

Builds a synthetic vocab.json/merges.txt (no network assets in the env),
loads BOTH implementations from the same directory, and compares ids across
normalization, merges, contractions, specials, truncation and padding.
Reference stake: the HF tokenizer the reference loads from the SD
checkpoint's tokenizer/ dir (modules/pipeline.py:47-56).
"""

import json
import os

import pytest

from sketch2img_tpu.data.tokenizer import (
    BOS_TOKEN,
    EOS_TOKEN,
    CLIPBPETokenizer,
    bytes_to_unicode,
)

transformers = pytest.importorskip("transformers")


MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("ca", "t"),
    ("cat", "s</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("1", "2"),  # digits tokenize singly — this merge must never fire
    ("'", "s</w>"),
    (".", ".</w>"),
    ("é", "e</w>"),
]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    symbols = list(bytes_to_unicode().values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    for a, b in MERGES:
        vocab[a + b] = len(vocab)
    vocab[BOS_TOKEN] = len(vocab)
    vocab[EOS_TOKEN] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in MERGES))
    return str(d)


@pytest.fixture(scope="module")
def both(tok_dir):
    theirs = transformers.CLIPTokenizer.from_pretrained(tok_dir)
    ours = CLIPBPETokenizer.from_pretrained(tok_dir)
    return theirs, ours


PROMPTS = [
    "the cat",
    "The   CAT\tsat,  ing!",
    "cats cat the thecat",
    "a cat's hat, 12 cats...",
    "masterpiece, best quality, 1girl, looking at viewer",
    "",
    "   ",
    "café étude",  # multi-byte UTF-8 through the byte encoder
    "don't stop",
    "the " * 60,  # > 77 tokens — exercises truncation
    f"photo of {EOS_TOKEN} leak",  # special token inside user text
]


@pytest.mark.parametrize("prompt", PROMPTS)
def test_ids_match_transformers(both, prompt):
    theirs, ours = both
    a = theirs(prompt, padding="max_length", truncation=True, max_length=77).input_ids
    b = ours(prompt, padding="max_length", truncation=True, max_length=77).input_ids
    assert a == b


def test_batch_and_do_not_pad_match(both):
    theirs, ours = both
    a = theirs(PROMPTS[:5], padding="max_length", truncation=True, max_length=77)
    b = ours(PROMPTS[:5], padding="max_length", truncation=True, max_length=77)
    assert a.input_ids == b.input_ids
    a = theirs("a cat's hat", padding="do_not_pad", truncation=True, max_length=77)
    b = ours("a cat's hat", padding="do_not_pad", truncation=True, max_length=77)
    assert a.input_ids == b.input_ids


def test_special_ids_and_pad(both):
    theirs, ours = both
    assert ours.bos_token_id == theirs.bos_token_id
    assert ours.eos_token_id == theirs.eos_token_id
    assert ours.pad_token_id == theirs.pad_token_id
    row = ours("cat", padding="max_length", truncation=True, max_length=8).input_ids
    assert row[0] == ours.bos_token_id
    assert row[-1] == ours.pad_token_id
    assert len(row) == 8


def test_decode_matches_transformers(both):
    theirs, ours = both
    ids = ours.encode("the cat's hat, ing 1 2")
    # CLIP decode re-spaces at </w> boundaries ("cat 's hat ,") — parity with
    # HF's decode is the contract, not inverse of encode.
    assert ours.decode(ids) == theirs.decode(ids, skip_special_tokens=True).strip()


def test_runtime_loads_native_tokenizer(tok_dir):
    """SDComponents.from_pretrained-style loading goes through the native
    tokenizer (runtime imports it; no transformers needed at serve time)."""
    from sketch2img_tpu.runtime import _load_tokenizer

    tok = _load_tokenizer(os.path.dirname(tok_dir) and tok_dir)
    assert isinstance(tok, CLIPBPETokenizer)
    out = tok(["the cat"], padding="max_length", truncation=True, max_length=77)
    assert len(out.input_ids[0]) == 77
