"""Debug helpers (SURVEY.md §5 race-detection row): jit purity + explicit
PRNG keys already remove the reference's hook-mutation hazards (`.output`
attributes, `del block.output`); these add numeric tripwires."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks() -> None:
    """Global NaN tripwire (jax_debug_nans) — debug configs only."""
    jax.config.update("jax_debug_nans", True)


def assert_tree_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (post-step validation)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = jnp.asarray(leaf)
        if arr.dtype.kind != "f":
            continue
        if not bool(jnp.isfinite(arr).all()):
            keystr = "/".join(
                str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
                for p in path
            )
            raise FloatingPointError(f"non-finite values in {name}:{keystr}")
