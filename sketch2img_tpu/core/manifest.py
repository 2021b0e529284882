"""Checkpoint key-inventory manifests + strict torch->Flax conversion.

The reference loads published torch checkpoints whose key layout it never
controls: the diffusers-format SD1.x directory (`trainer.py:102`
``StableDiffusionPipeline.from_pretrained``), ``edge_predictor.pt``
(app.py:67-68), and ``netG.pth`` (trainer.py:114). Our converters
(core/convert.py and the per-model converters) re-map those layouts into
Flax trees — and a converter that silently skips a renamed key would load
garbage weights without failing.

Two guards close that hole:

1. **Committed manifests** (``sketch2img_tpu/assets/manifests/*.json``):
   the authoritative key->shape inventory of every checkpoint family the
   framework ingests, generated once by ``tools/gen_manifests.py`` from
   meta-device torch module trees (diffusers/transformers/pix2pix naming)
   and committed as fixtures. Tests build synthetic checkpoints FROM the
   manifests and require each converter to consume every key.
2. **Strict conversion** (``strict_convert``): wraps a state dict so key
   reads are tracked; after conversion, any unconsumed key (minus known
   ignorable buffers like BatchNorm's ``num_batches_tracked`` or old
   transformers' ``position_ids``) raises, as does any missing key —
   with the full lists in the error message.
"""

from __future__ import annotations

import fnmatch
import json
import os
from typing import Dict, Iterable, List, Mapping, Sequence, Tuple

import numpy as np

MANIFEST_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "assets", "manifests")

#: keys that may appear in real checkpoints but carry no loadable weight —
#: non-persistent-buffer leftovers from old torch/transformers versions.
DEFAULT_IGNORE: Tuple[str, ...] = (
    "*position_ids",          # transformers <4.31 persistent buffer
    "*num_batches_tracked",   # torch BatchNorm bookkeeping
)


class ConversionError(RuntimeError):
    """A checkpoint's key inventory doesn't match what the converter expects."""


def manifest_path(name: str) -> str:
    return os.path.join(MANIFEST_DIR, name + ".json")


def load_manifest(name: str) -> Dict[str, List[int]]:
    """Load a committed manifest: {torch key: shape list}. ``_meta`` is
    stripped (provenance/notes live there)."""
    with open(manifest_path(name)) as f:
        data = json.load(f)
    return {k: v for k, v in data.items() if not k.startswith("_")}


def load_manifest_meta(name: str) -> dict:
    with open(manifest_path(name)) as f:
        return json.load(f).get("_meta", {})


def zeros_state_dict(manifest: Mapping[str, Sequence[int]],
                     dtype=np.float32) -> Dict[str, np.ndarray]:
    """Synthetic checkpoint with the manifest's exact keys and shapes.
    np.zeros pages are lazily allocated, so even the full 860M-param UNet
    inventory is cheap to 'materialize' for shape-level tests."""
    return {k: np.zeros(tuple(shape), dtype) for k, shape in manifest.items()}


class TrackedStateDict(Mapping):
    """Read-through state-dict wrapper that records which keys a converter
    consumed. ``in`` checks (converters use them to sniff layout variants)
    do not count as consumption."""

    def __init__(self, sd: Mapping):
        self._sd = sd
        self.consumed: set = set()

    def __getitem__(self, k):
        v = self._sd[k]
        self.consumed.add(k)
        return v

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def keys(self):
        return self._sd.keys()

    def items(self):
        # iterating items consumes: converters that re-key the whole dict
        # (anime2sketch module.-strip, safety-checker vision_model.-strip)
        # hand every tensor to a sub-converter
        for k in self._sd:
            yield k, self[k]

    def values(self):
        for k in self._sd:
            yield self[k]

    def leftover(self, ignore: Iterable[str] = DEFAULT_IGNORE) -> List[str]:
        out = []
        for k in self._sd:
            if k in self.consumed:
                continue
            if any(fnmatch.fnmatch(k, pat) for pat in ignore):
                continue
            out.append(k)
        return sorted(out)


class PrefixStripView(Mapping):
    """Read-through view of ``sd`` with ``prefix`` stripped from key names.

    Converters that re-map a sub-tree (safety checker's nested
    ``vision_model.``, DataParallel's ``module.``) must NOT copy the dict —
    a copy reads every tensor and defeats consumption tracking. This view
    translates key names and delegates reads, so only keys the sub-converter
    actually uses count as consumed."""

    def __init__(self, sd: Mapping, prefix: str):
        self._sd = sd
        self._prefix = prefix
        self._keys = [k[len(prefix):] for k in sd if k.startswith(prefix)]

    def __getitem__(self, k):
        return self._sd[self._prefix + k]

    def __contains__(self, k):
        return (self._prefix + k) in self._sd

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)


def strict_convert(convert_fn, state_dict, *args,
                   ignore: Iterable[str] = DEFAULT_IGNORE,
                   what: str = "checkpoint", **kwargs):
    """Run ``convert_fn(state_dict, *args, **kwargs)`` and require it to
    consume every key (minus ``ignore`` patterns). Missing keys surface as
    ConversionError naming the key; unknown keys surface as ConversionError
    listing them. This is the default ingestion path —
    ``SDComponents.from_diffusers_dir(strict=False)`` is the escape hatch
    for intentionally partial checkpoints."""
    tracked = TrackedStateDict(state_dict)
    try:
        out = convert_fn(tracked, *args, **kwargs)
    except KeyError as e:
        raise ConversionError(
            f"{what}: missing key {e.args[0]!r} — the checkpoint does not "
            f"match the expected layout (see assets/manifests/). Pass "
            f"strict=False to load anyway."
        ) from e
    left = tracked.leftover(ignore)
    if left:
        preview = ", ".join(left[:8]) + (" ..." if len(left) > 8 else "")
        raise ConversionError(
            f"{what}: {len(left)} unconsumed key(s) in the checkpoint — "
            f"either a layout drift or extra weights the converter would "
            f"silently drop: {preview}. Pass strict=False to load anyway."
        )
    return out


def diff_keys(manifest: Mapping[str, Sequence[int]], state_dict: Mapping,
              ignore: Iterable[str] = DEFAULT_IGNORE) -> Tuple[List[str], List[str]]:
    """(missing, unexpected) of ``state_dict`` vs the manifest."""
    def keep(k):
        return not any(fnmatch.fnmatch(k, pat) for pat in ignore)

    mk = {k for k in manifest if keep(k)}
    sk = {k for k in state_dict if keep(k)}
    return sorted(mk - sk), sorted(sk - mk)
