"""Persistent compilation cache helper (serving warm-start surface)."""

import os

import jax

from sketch2img_tpu.utils import compile_cache


def test_explicit_dir_enables_and_is_idempotent(tmp_path, monkeypatch):
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    d = str(tmp_path / "cache")
    assert compile_cache.enable(d) is True
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # same dir: still true; different explicit dir: honest False
    assert compile_cache.enable(d) is True
    assert compile_cache.enable(str(tmp_path / "other")) is False
    assert jax.config.jax_compilation_cache_dir == d
    # implicit enable after an explicit one reports the active cache
    assert compile_cache.enable() is True


def test_opt_out(monkeypatch, tmp_path):
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    monkeypatch.setenv("SKETCH2IMG_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable(str(tmp_path / "x")) is False


def test_cpu_default_is_noop(monkeypatch):
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    monkeypatch.delenv("SKETCH2IMG_COMPILE_CACHE", raising=False)
    # tests run on the forced-CPU backend: implicit enable must decline
    assert compile_cache.enable() is False
