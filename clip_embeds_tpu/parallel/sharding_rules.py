"""PartitionSpec rules for CLIP params over a (data, model) mesh.

Megatron-style tensor parallelism for the transformer blocks: QKV and MLP
up-projections shard their output features over the model axis; the following
down-projections shard their input features, so each block needs a single
all-reduce. Embedding-sized tensors stay replicated. (The reference has no TP
at all — SURVEY.md §2e; this exists for the big-tower/LLaVA path and for
exercising real multi-chip shardings in the dry run.)
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for_path(path: tuple) -> P:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(keys)
    if joined.endswith("attn/in_proj/kernel") or joined.endswith("mlp/c_fc/kernel"):
        return P(None, MODEL_AXIS)  # column parallel
    if joined.endswith("attn/in_proj/bias") or joined.endswith("mlp/c_fc/bias"):
        return P(MODEL_AXIS)
    if joined.endswith("attn/out_proj/kernel") or joined.endswith("mlp/c_proj/kernel"):
        return P(MODEL_AXIS, None)  # row parallel
    if joined.endswith("token_embedding/embedding"):
        return P(None, None)
    return P()  # replicate


def clip_param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a CLIP (or tower) param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(path), params
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    specs = clip_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def zero1_opt_state_sharding(mesh: Mesh, opt_state: Any, axis: str = "data") -> Any:
    """Shard optimizer-moment leaves over the data axis (ZeRO-1 style).

    The reference's DDP replicates optimizer state on every GPU; under pjit we
    can instead shard the Adam mu/nu leaves across the mesh — params stay
    replicated, XLA inserts the gather/scatter around the update. Leaves whose
    leading dim does not divide the axis are left replicated.
    """
    n = mesh.shape[axis]

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] % n == 0 \
                and leaf.shape[0] >= n:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, spec_for(leaf)), opt_state
    )
