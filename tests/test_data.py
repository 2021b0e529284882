"""ImageStore / tag-processing / loader tests (SURVEY.md §4: tag determinism
under seeded RNG, dataset scan with sidecar captions, collate padding)."""

import random

import numpy as np
import pytest
from PIL import Image

from sketch2img_tpu.data.dataset import ImageStore
from sketch2img_tpu.data.loader import Loader
from sketch2img_tpu.data.tags import process_tags


class FakeTokenizerOutput:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    pad_token_id = 99

    def __call__(self, prompt, padding=None, truncation=None, max_length=None):
        ids = [ord(c) % 90 for c in prompt][:max_length]
        return FakeTokenizerOutput(ids)


@pytest.fixture()
def corpus(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        img = Image.fromarray(rng.randint(0, 255, (40 + i, 48, 3), np.uint8))
        img.save(d / f"im{i}.png")
        (d / f"im{i}.txt").write_text(f"1girl solo tag{i} flower sky")
    # one skip-tagged image (comic -> skip, dataset.py:196-198)
    img = Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8))
    img.save(d / "skip.png")
    (d / "skip.txt").write_text("comic 1girl")
    return d


def test_tag_determinism():
    tags = "artist:foo copyright:bar 1girl solo highres flower sky tree"
    r1 = process_tags(tags, rng=random.Random(5))
    r2 = process_tags(tags, rng=random.Random(5))
    assert r1 == r2
    out, skip = r1
    assert out.startswith("Tags: ")
    assert not skip
    assert "highres" not in out  # bad meta tag removed


def test_tag_skip_flags():
    _, skip = process_tags("comic 1girl", rng=random.Random(0))
    assert skip
    _, skip = process_tags("text_focus portrait", rng=random.Random(0))
    assert skip
    out, _ = process_tags("nsfw 1girl", rng=random.Random(0))
    assert "nsfw" in out


def test_tag_count_bounds():
    many = " ".join(f"tag{i}" for i in range(100))
    out, _ = process_tags(many, rng=random.Random(1))
    n = len(out[len("Tags: "):].split(", "))
    assert 24 <= n <= 72


def test_imagestore_scan_and_skip(corpus):
    store = ImageStore([str(corpus)], size=32, tokenizer=FakeTokenizer(), seed=1)
    assert len(store) == 6  # comic-tagged image skipped
    ex = store[0]
    assert ex["images"].shape == (32, 32, 3)
    assert ex["images"].dtype == np.float32
    assert ex["images"].min() >= -1.0 and ex["images"].max() <= 1.0
    assert isinstance(ex["prompt_ids"], list)


def test_imagestore_no_tag_processing(corpus):
    store = ImageStore([str(corpus)], size=32, tokenizer=FakeTokenizer(),
                       process_tags=False, seed=1)
    assert len(store) == 7  # nothing skipped


def test_collate_padding(corpus):
    store = ImageStore([str(corpus)], size=32, tokenizer=FakeTokenizer(), seed=1)
    batch = store.collate_fn([store[0], store[1]])
    assert batch["input_ids"].shape[0] == 2
    assert batch["pixels"].shape == (2, 32, 32, 3)
    fixed = store.collate_fn([store[0], store[1]], pad_to=64)
    assert fixed["input_ids"].shape == (2, 64)
    assert (fixed["input_ids"][:, -1] == FakeTokenizer.pad_token_id).all()


def test_latent_cache(corpus):
    store = ImageStore([str(corpus)], size=32, tokenizer=FakeTokenizer(), seed=1)

    def encode_fn(px):
        return px[:, ::8, ::8, :2]  # fake encoder moments

    def sketch_fn(px):
        return -px[:, ::8, ::8, :2]

    store.cache_latents(encode_fn, sketch_fn)
    ex = store[0]
    assert ex["latent_dist"].shape == (4, 4, 2)
    assert ex["sketch_latent_dist"].shape == (4, 4, 2)
    batch = store.collate_fn([store[0], store[1]], pad_to=16)
    assert "pixels" not in batch
    assert batch["latent_dist"].shape == (2, 4, 4, 2)
    assert batch["sketch_latent_dist"].shape == (2, 4, 4, 2)


def test_allow_duplicates(corpus):
    store = ImageStore([(str(corpus), 2)], size=32, tokenizer=FakeTokenizer(),
                       allow_duplicates=True, seed=1)
    assert len(store) == 12
    assert "@" in store.entries[0][0]
    ex = store[0]  # hex-prefixed path still readable (dataset.py:125-127)
    assert ex["images"].shape == (32, 32, 3)


class _IndexDataset:
    """Batches ARE the selected dataset indices — lets tests assert exactly
    which examples a loader consumed, in order."""

    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i

    def collate_fn(self, examples, pad_to=None):
        return tuple(examples)


def test_loader_resume_continuity():
    """Kill a run mid-epoch, resume in a fresh loader with
    (set_epoch, skip_batches) — the apps/train_lgp.py --resume wiring
    (start_epoch = step // len(loader), skip = step % len(loader)) — and
    the concatenated stream of consumed batches equals the uninterrupted
    run's exactly: no replayed epoch head, no skipped data (VERDICT r4
    item 6; the reference replays the epoch head, trainer.py:172-175)."""
    epochs, bsz = 3, 2
    make = lambda: Loader(_IndexDataset(10), bsz, seed=5)  # noqa: E731

    full_loader = make()
    n_per_epoch = len(full_loader)
    uninterrupted = [b for _ in range(epochs) for b in full_loader]

    for stop_at in (2, n_per_epoch, n_per_epoch + 3):  # mid, boundary, 2nd
        run1 = make()
        consumed = []
        for _ in range(epochs):
            for b in run1:
                consumed.append(b)
                if len(consumed) == stop_at:
                    break
            if len(consumed) == stop_at:
                break  # "killed" here; checkpoint holds step == stop_at

        run2 = make()  # fresh process
        run2.set_epoch(stop_at // n_per_epoch)
        run2.skip_batches(stop_at % n_per_epoch)
        for _ in range(stop_at // n_per_epoch, epochs):
            consumed.extend(run2)
        assert consumed == uninterrupted, stop_at


def test_bucket_batcher_resume_continuity():
    """Same resume contract for the ARB path (BucketBatcher.set_epoch /
    skip_batches)."""
    from sketch2img_tpu.data.arb import BucketBatcher

    assignments = {i: ((256, 512) if i % 3 else (512, 512))
                   for i in range(13)}
    make = lambda: BucketBatcher(assignments, 2, seed=4)  # noqa: E731
    epochs = 2
    full = make()
    n_per_epoch = len(full)
    uninterrupted = [b for _ in range(epochs) for b in full]

    stop_at = n_per_epoch + 1
    run1 = make()
    consumed = []
    for _ in range(epochs):
        for b in run1:
            consumed.append(b)
            if len(consumed) == stop_at:
                break
        if len(consumed) == stop_at:
            break
    run2 = make()
    run2.set_epoch(stop_at // n_per_epoch)
    run2.skip_batches(stop_at % n_per_epoch)
    for _ in range(stop_at // n_per_epoch, epochs):
        consumed.extend(run2)
    assert consumed == uninterrupted


def test_loader_sharding_and_prefetch(corpus):
    store = ImageStore([str(corpus)], size=32, tokenizer=FakeTokenizer(), seed=1)
    l0 = Loader(store, 1, seed=3, process_index=0, process_count=2, pad_to=16)
    l1 = Loader(store, 1, seed=3, process_index=1, process_count=2, pad_to=16)
    b0 = [b for b in l0]
    b1 = [b for b in l1]
    assert len(b0) == 3 and len(b1) == 3
    for b in b0 + b1:
        assert b["input_ids"].shape == (1, 16)
        assert b["pixels"].shape == (1, 32, 32, 3)
