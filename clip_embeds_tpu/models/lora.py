"""LoRA adapters over flax param trees.

Reference usage (VLM2Vec/src/model.py:97-144): peft LoraConfig with
target_modules q/k/v/o/gate/up/down projections, vision tower excluded
(``exclude_modules='.*vision_tower.*'``), adapters merged into the base
weights at load time for eval (model.py:194-203 merge_and_unload).

Implementation: adapters live in a separate pytree mirroring the targeted
kernels; ``materialize`` adds scale * A @ B onto (stop-gradient) base params,
so a train step differentiates only the adapter tree — the JAX equivalent of
marking base weights requires_grad=False.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def _path_names(path: tuple) -> Tuple[str, ...]:
    return tuple(getattr(p, "key", str(p)) for p in path)


def _is_target(
    path: tuple,
    targets: Sequence[str],
    exclude: Sequence[str],
) -> bool:
    names = _path_names(path)
    if names[-1] != "kernel":
        return False
    if any(e in names for e in exclude):
        return False
    return any(t in names for t in targets)


def init_lora(
    params: Any,
    rank: int = 8,
    rng: Optional[jax.Array] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
    exclude: Sequence[str] = ("vision_tower",),
) -> Dict[str, Any]:
    """LoRA tree: for each targeted kernel [in, out] -> {'a': [in, r] (gaussian),
    'b': [r, out] (zeros)} (peft init convention)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora_flat = {}
    for path, leaf in flat:
        if _is_target(path, targets, exclude):
            rng, key = jax.random.split(rng)
            d_in, d_out = leaf.shape
            lora_flat["/".join(_path_names(path))] = {
                "a": jax.random.normal(key, (d_in, rank), jnp.float32)
                * (1.0 / rank),
                "b": jnp.zeros((rank, d_out), jnp.float32),
            }
    return lora_flat


def materialize(
    params: Any,
    lora: Dict[str, Any],
    alpha: float = 16.0,
    rank: Optional[int] = None,
    train: bool = True,
) -> Any:
    """Base params (+stop_gradient when training) with LoRA deltas added."""
    if rank is None and lora:
        rank = next(iter(lora.values()))["a"].shape[-1]
    scale = alpha / (rank or 1)

    def update(path, leaf):
        key = "/".join(_path_names(path))
        if key in lora:
            base = jax.lax.stop_gradient(leaf) if train else leaf
            ab = lora[key]["a"] @ lora[key]["b"]
            return base + scale * ab.astype(leaf.dtype)
        return jax.lax.stop_gradient(leaf) if train else leaf

    return jax.tree_util.tree_map_with_path(update, params)


def merge_lora(
    params: Any, lora: Dict[str, Any], alpha: float = 16.0
) -> Any:
    """Permanently fold adapters into the base weights (merge_and_unload)."""
    return materialize(params, lora, alpha, train=False)
