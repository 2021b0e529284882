"""Checkpoint / resume via orbax (SURVEY.md §5 checkpoint row).

Two layers, mirroring the reference:
  * full training state (params + opt state + step + PRNG) for resume —
    replaces ``accelerator.load_state`` (trainer.py:172-175), but at a
    step-level cadence rather than the reference's epoch-only save;
  * model-only export per epoch — replaces
    ``accelerator.save(state_dict(), "*.pt")`` (trainer.py:273-279).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_train_state(directory: str, step: int, state: Any, keep: int = 3) -> str:
    """Save the pytree ``state`` under ``directory/step_<N>``; prune old."""
    import orbax.checkpoint as ocp  # train extra (pyproject [train])

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # prune
    existing = sorted(
        d for d in os.listdir(directory) if d.startswith("step_")
    )
    for stale in existing[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(directory, stale), ignore_errors=True)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    return os.path.join(directory, steps[-1]) if steps else None


def restore_train_state(path: str, template: Any) -> Any:
    """Restore into the structure/shardings of ``template``."""
    import orbax.checkpoint as ocp  # train extra (pyproject [train])

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def export_params_npz(path: str, params: Any) -> None:
    """Flat model-only export (epoch artifact, trainer.py:279 equivalent)."""
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(jax.device_get(params)).items()
    }
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    from flax.traverse_util import unflatten_dict

    with np.load(path) as data:
        return unflatten_dict({tuple(k.split("/")): data[k] for k in data.files})
