"""Self-contained CLIP BPE tokenizer — no ``transformers`` dependency.

The reference tokenizes prompts with HF ``CLIPTokenizer``
(/root/reference/modules/pipeline.py:47-56, trainer.py:48-61, via the SD
checkpoint's ``tokenizer/`` directory). For a serving-native framework we own
the tokenizer: this module reads the exact same ``vocab.json``/``merges.txt``
assets every diffusers-layout checkpoint ships and reproduces HF's token ids
bit-for-bit (tested against ``transformers.CLIPTokenizer`` in
tests/test_tokenizer.py).

Algorithm (the OpenAI CLIP scheme):
  1. normalize: collapse whitespace, strip, lowercase. (HF additionally runs
     ftfy mojibake fixing when ftfy is installed; for clean input text
     ``ftfy.fix_text`` is the identity, so ids agree. This environment's
     transformers falls back to a BERT BasicTokenizer which is also
     whitespace-collapse + lowercase for non-CJK text.)
  2. split with the CLIP regex (contractions, letter runs, single digits,
     punctuation runs; the special tokens match verbatim).
  3. per word: UTF-8 bytes -> printable-unicode symbols (the GPT-2 byte
     mapping), append ``</w>`` to the final symbol, then greedily apply the
     lowest-rank BPE merge until none applies.
  4. ids: ``vocab[token]`` with the unk (= eos) fallback;
     ``[bos] + ids[:max_length-2] + [eos]`` + eos-padding.

Host-side and stateless — tokenization never touches the device; the jit'd
text encoder consumes the fixed (B, 77) int32 id matrices this produces.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

try:  # \p{L}/\p{N} classes need the `regex` module (transformers dep, in env)
    import regex as _re

    _PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - ASCII-only fallback
    import re as _re

    _PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+",
        _re.IGNORECASE,
    )

_WS = __import__("re").compile(r"\s+")

BOS_TOKEN = "<|startoftext|>"
EOS_TOKEN = "<|endoftext|>"


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode-char map.

    Printable bytes map to themselves; the rest shift into U+0100.. so no
    BPE symbol is whitespace or a control character.
    """
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: Tuple[str, ...]) -> set:
    return {(a, b) for a, b in zip(word, word[1:])}


class TokenizerOutput:
    """Duck-typed slice of HF's BatchEncoding: just what the repo consumes."""

    def __init__(self, input_ids, attention_mask):
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def __getitem__(self, key):
        return {"input_ids": self.input_ids, "attention_mask": self.attention_mask}[key]


class CLIPBPETokenizer:
    """Drop-in for the repo's uses of HF ``CLIPTokenizer`` (callable with
    ``padding``/``truncation``/``max_length``, ``.pad_token_id``,
    ``encode``/``decode``)."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]]):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache = {BOS_TOKEN: BOS_TOKEN, EOS_TOKEN: EOS_TOKEN}
        self.bos_token_id = self.encoder[BOS_TOKEN]
        self.eos_token_id = self.encoder[EOS_TOKEN]
        self.unk_token_id = self.eos_token_id
        self.pad_token_id = self.eos_token_id  # SD tokenizer_config pads with eos
        self.model_max_length = 77

    # -- loading ----------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str) -> "CLIPBPETokenizer":
        """Load from a diffusers-layout ``tokenizer/`` dir (or a dir holding
        ``vocab.json`` + ``merges.txt``)."""
        vocab_file = os.path.join(path, "vocab.json")
        merges_file = os.path.join(path, "merges.txt")
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            # HF skips line 1 (the "#version:" header) and caps the count;
            # mirror exactly so the same assets give the same ranks.
            lines = f.read().strip().split("\n")[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in lines]
        return cls(vocab, merges)

    # -- core algorithm ---------------------------------------------------

    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def tokenize(self, text: str) -> List[str]:
        text = _WS.sub(" ", text).strip().lower()
        tokens: List[str] = []
        for word in _PAT.findall(text):
            word = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            tokens.extend(self._bpe(word).split(" "))
        return tokens

    def encode(self, text: str, max_length: Optional[int] = None) -> List[int]:
        """[bos] + ids + [eos], truncated to ``max_length`` (eos kept)."""
        ids = [self.encoder.get(t, self.unk_token_id) for t in self.tokenize(text)]
        if max_length is not None:
            ids = ids[: max_length - 2]
        return [self.bos_token_id] + ids + [self.eos_token_id]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        specials = {self.bos_token_id, self.eos_token_id}
        toks = [
            self.decoder.get(int(i), EOS_TOKEN)
            for i in ids
            if not (skip_special_tokens and int(i) in specials)
        ]
        text = "".join(toks)
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    # -- HF-compatible call surface ---------------------------------------

    def __call__(
        self,
        text: Union[str, Sequence[str]],
        padding: Union[str, bool, None] = None,
        truncation: bool = False,
        max_length: Optional[int] = None,
    ) -> TokenizerOutput:
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        limit = max_length if (truncation and max_length is not None) else None
        rows = [self.encode(t, max_length=limit) for t in texts]

        if padding == "max_length" and max_length is not None:
            width = max_length
        elif padding in ("longest", True):
            width = max(len(r) for r in rows)
        else:  # None / False / "do_not_pad"
            width = None

        if width is not None:
            masks = [[1] * len(r) + [0] * (width - len(r)) for r in rows]
            rows = [r + [self.pad_token_id] * (width - len(r)) for r in rows]
        else:
            masks = [[1] * len(r) for r in rows]

        if single:
            return TokenizerOutput(rows[0], masks[0])
        return TokenizerOutput(rows, masks)
