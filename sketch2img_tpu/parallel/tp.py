"""Tensor-parallel parameter shardings for serving (the ``model`` mesh axis).

The reference has no model parallelism (SURVEY.md §2.3) — SD1.x fits one
chip — so this is the TPU-native growth path the mesh API reserved: shard
the UNet's attention projections Megatron-style over ``model`` and let
GSPMD insert the collectives (they ride the inner-ICI axis `make_mesh`
lays out):

  * to_q / to_k / to_v kernels: column-sharded, P(None, "model") — each
    shard owns ``heads / model_size`` attention heads end-to-end, no
    communication inside the attention math.
  * to_out kernel: row-sharded, P("model", None) — the matching
    contraction; XLA inserts ONE psum per attention to rebuild the
    activations (to_out bias stays replicated and is added after).
  * everything else (convs, norms, FFN, embeddings): replicated. The FFN's
    GEGLU proj_in interleaves value/gate halves in its output dim, so a
    naive column shard would put the elementwise gate across shard
    boundaries; it stays replicated until measured to matter.

``heads`` must divide by the model-axis size at every attention site
(SD1.5: 8 heads everywhere).

The Pallas flash kernels are jit-level custom calls without a GSPMD
partitioning rule, so TP serving must opt in via
``ops.attention.set_tensor_parallel_context(mesh)``: qualifying attention
sites then run the kernel inside a ``jax.shard_map`` over ``model`` on
each device's local heads (exact, zero collectives — heads are sharded
whole). Without the context, attention under a >1 model axis uses the
XLA path, which GSPMD partitions automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sketch2img_tpu.parallel.mesh import MODEL_AXIS

_COL_SHARDED = ("to_q", "to_k", "to_v")   # kernels (in, heads*dim)
_ROW_SHARDED = ("to_out",)                # kernel (heads*dim, out)


def tp_param_specs(params) -> dict:
    """PartitionSpec pytree matching ``params`` (UNet / injected-UNet tree):
    attention projections sharded over ``model``, the rest replicated."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        parent = path[-2] if len(path) >= 2 else ""
        leaf = path[-1]
        if parent in _COL_SHARDED and leaf == "kernel":
            return P(None, MODEL_AXIS)
        if parent in _ROW_SHARDED and leaf == "kernel":
            return P(MODEL_AXIS, None)
        return P()

    return walk(params, ())


def shard_params_tp(mesh: Mesh, params):
    """Place ``params`` on ``mesh`` with tensor-parallel attention shardings.

    (Own recursion rather than tree_map over the spec tree: PartitionSpec
    is tuple-like and would be flattened as a pytree node.)"""

    def walk(tree, spec):
        if isinstance(tree, dict):
            return {k: walk(v, spec[k]) for k, v in tree.items()}
        return jax.device_put(tree, NamedSharding(mesh, spec))

    return walk(params, tp_param_specs(params))
