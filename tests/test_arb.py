"""Aspect-ratio bucketing (the reference's dead arb: block, made real)."""

import numpy as np
import pytest
from PIL import Image

from sketch2img_tpu.data.arb import BucketBatcher, assign_bucket, generate_buckets
from sketch2img_tpu.data.dataset import ImageStore


class FakeTokenizerOutput:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    pad_token_id = 99

    def __call__(self, prompt, padding=None, truncation=None, max_length=None):
        return FakeTokenizerOutput([1, 2, 3])


def test_generate_buckets_properties():
    buckets = generate_buckets((512, 512), (768, 512), 64, 256, 1024)
    assert (512, 512) in buckets
    assert (768, 512) in buckets and (512, 768) in buckets
    for w, h in buckets:
        assert w % 64 == 0 and h % 64 == 0
        assert 256 <= w <= 1024 and 256 <= h <= 1024
        if (w, h) not in ((768, 512), (512, 768)):
            assert w * h <= 512 * 512
    # mirrored
    assert all((h, w) in buckets for w, h in buckets)


def test_assign_bucket_prefers_matching_ar():
    buckets = generate_buckets()
    assert assign_bucket(512, 512, buckets) == (512, 512)
    w, h = assign_bucket(1600, 800, buckets)  # 2:1 landscape
    assert w > h
    w, h = assign_bucket(400, 900, buckets)   # tall portrait
    assert h > w


def test_assign_bucket_ar_error_cap():
    assert assign_bucket(10000, 10, [(512, 512)], max_ar_error=0.5) is None


def test_bucket_batcher_same_bucket_batches():
    assignments = {i: (512, 512) for i in range(5)}
    assignments.update({i: (640, 448) for i in range(5, 12)})
    b = BucketBatcher(assignments, batch_size=2, seed=0)
    assert len(b) == 2 + 3
    for bucket, idxs in b:
        assert len(idxs) == 2
        assert all(assignments[i] == bucket for i in idxs)


def test_imagestore_arb(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    sizes = [(300, 300), (600, 300), (280, 640)]
    for i, (w, h) in enumerate(sizes):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(d / f"i{i}.png")
        (d / f"i{i}.txt").write_text("1girl solo")
    store = ImageStore([str(d)], size=512, tokenizer=FakeTokenizer(),
                       process_tags=False, seed=1)
    assignments = store.enable_arb({"base_res": (512, 512), "min_dim": 256,
                                    "dim_limit": 1024, "divisible": 64})
    assert len(assignments) == 3
    for idx, bucket in assignments.items():
        ex = store.get_bucketed(idx, bucket)
        bw, bh = bucket
        assert ex["images"].shape == (bh, bw, 3)
        assert -1.0 <= ex["images"].min() and ex["images"].max() <= 1.0
