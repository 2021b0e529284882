"""Packaging integrity (pyproject.toml): every console entry point resolves
to a real callable, the package data (checkpoint manifests) ships, and the
declared dependency surface covers what the package imports.

The editable-install proof itself (pip install -e . in a clean venv ->
``sketch2img-serve --help``) runs out-of-band (it mutates an environment);
these tests pin everything that could silently rot in-tree."""

import importlib
import os
import re

import pytest

try:  # py3.11+
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    if tomllib is None:
        pytest.skip("tomllib unavailable")
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 8
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_manifests_declared_as_package_data(pyproject):
    patterns = pyproject["tool"]["setuptools"]["package-data"]["sketch2img_tpu"]
    assert any("assets/manifests" in p for p in patterns)
    mdir = os.path.join(ROOT, "sketch2img_tpu", "assets", "manifests")
    names = sorted(os.listdir(mdir))
    assert {"unet_sd15.json", "vae_sd15.json", "text_encoder_sd15.json",
            "safety_checker_sd15.json", "edge_predictor.json",
            "netG.json"} <= set(names)


def test_core_dependencies_cover_core_imports(pyproject):
    """Everything the non-optional package code imports at module scope must
    be in [project.dependencies] (torch/gradio/orbax/wandb/hub are extras,
    imported lazily inside functions)."""
    deps = " ".join(pyproject["project"]["dependencies"]).lower()
    for mod, dep in [("jax", "jax"), ("flax", "flax"), ("optax", "optax"),
                     ("numpy", "numpy"), ("PIL", "pillow"),
                     ("safetensors", "safetensors"), ("regex", "regex"),
                     ("yaml", "pyyaml"), ("tqdm", "tqdm")]:
        assert dep in deps, f"{mod} used but {dep} not declared"

    # extras stay lazy: no top-level torch/gradio/orbax/wandb imports
    bad = []
    for dirpath, _, files in os.walk(os.path.join(ROOT, "sketch2img_tpu")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if re.match(r"^(import|from)\s+(torch|gradio|orbax|wandb|"
                                r"huggingface_hub|transformers)\b", line):
                        bad.append(f"{path}:{i}: {line.strip()}")
    assert not bad, ("optional deps imported at module top level "
                     "(breaks core-only installs):\n" + "\n".join(bad))


def test_version_is_consistent(pyproject):
    import sketch2img_tpu

    if hasattr(sketch2img_tpu, "__version__"):
        assert sketch2img_tpu.__version__ == pyproject["project"]["version"]
