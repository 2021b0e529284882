"""Shared test doubles."""


class FakeTokenizerOutput:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    """Deterministic stand-in for the HF CLIPTokenizer: single-string call
    returns a flat id list; list call returns list-of-lists (the HF batching
    contract the pipeline relies on)."""

    pad_token_id = 9

    def __call__(self, prompt, padding=None, truncation=None, max_length=77):
        def encode(text):
            ids = [ord(c) % 90 for c in text][:max_length]
            if padding == "max_length":
                ids = ids + [self.pad_token_id] * (max_length - len(ids))
            return ids

        if isinstance(prompt, str):
            return FakeTokenizerOutput(encode(prompt))
        return FakeTokenizerOutput([encode(t) for t in prompt])
