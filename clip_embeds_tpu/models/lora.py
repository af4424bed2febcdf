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
    # 'kernel' = nn.Dense base; 'kernel_q' = QuantDense W8A8 base (same
    # [in, out] layout) — adapters over a frozen int8 trunk use the
    # unmaterialized path (quant.py _lora_delta), never materialize()
    if names[-1] not in ("kernel", "kernel_q"):
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
    'b': [r, out] (zeros)} (peft init convention). Keys are canonicalized to
    end in '/kernel' even over a QuantDense ('kernel_q') base so the same
    adapter file serves fp and int8 trunks."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora_flat = {}
    for path, leaf in flat:
        if _is_target(path, targets, exclude):
            rng, key = jax.random.split(rng)
            d_in, d_out = leaf.shape
            names = _path_names(path)[:-1] + ("kernel",)
            lora_flat["/".join(names)] = {
                "a": jax.random.normal(key, (d_in, rank), jnp.float32)
                * (1.0 / rank),
                "b": jnp.zeros((rank, d_out), jnp.float32),
            }
    return lora_flat


def to_collection(lora: Dict[str, Any]) -> Dict[str, Any]:
    """Flat canonical adapter tree -> the nested flax 'lora' variable
    collection read by the unmaterialized side-path (quant.py _lora_delta):
    strip the trailing '/kernel' so each {'a', 'b'} pair lands at its Dense
    module's scope. Usage:
    ``model.apply({'params': base, 'lora': to_collection(lora)}, ...)`` with
    ``Llava(..., lora_rank=r)``."""
    lora = normalize_lora(lora)
    out: Dict[str, Any] = {}
    for key, ab in lora.items():
        parts = key.split("/")
        if parts[-1] in ("kernel", "kernel_q"):
            parts = parts[:-1]
        node = out
        for p in parts:
            node = node.setdefault(p, {})
        node["a"] = jnp.asarray(ab["a"])
        node["b"] = jnp.asarray(ab["b"])
    return out


def from_collection(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Nested 'lora' collection -> flat canonical ('path/to/kernel' keyed)."""
    flat: Dict[str, Any] = {}

    def walk(node, prefix):
        if isinstance(node, dict) and set(node) == {"a", "b"} \
                and not isinstance(node["a"], dict):
            flat[f"{prefix}/kernel" if prefix else "kernel"] = {
                "a": node["a"], "b": node["b"]}
            return
        for k, v in node.items():
            walk(v, f"{prefix}/{k}" if prefix else str(k))

    walk(tree, "")
    return flat


def normalize_lora(lora: Dict[str, Any]) -> Dict[str, Any]:
    """Canonicalize an adapter tree to the flat path-keyed layout
    ``{"path/to/kernel": {"a": [in, r], "b": [r, out]}}`` that
    ``init_lora`` produces.

    Accepts any of the three layouts that occur in practice:
      * canonical (returned by ``init_lora`` / used by the train step);
      * npz-flat (``np.savez(**flatten_params(lora))`` in
        cli/train_vlm2vec.py): keys like ``.../kernel/a`` -> array;
      * fully nested trees (e.g. ``unflatten_params`` of the above).
    """
    if not lora:
        return {}
    if all(
        isinstance(v, dict) and set(v) >= {"a", "b"}
        and not isinstance(v["a"], dict)
        for v in lora.values()
    ):
        return lora

    def flatten(node, prefix, out):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                flatten(v, key, out)
            else:
                out[key] = v

    flat: Dict[str, Any] = {}
    flatten(lora, "", flat)
    grouped: Dict[str, Dict[str, Any]] = {}
    for key, arr in flat.items():
        kernel_path, leaf = key.rsplit("/", 1)
        if leaf not in ("a", "b"):
            raise ValueError(
                f"LoRA adapter key {key!r} does not end in /a or /b — "
                "not a LoRA tree saved by init_lora/train_vlm2vec")
        grouped.setdefault(kernel_path, {})[leaf] = arr
    for kernel_path, ab in grouped.items():
        if set(ab) != {"a", "b"}:
            raise ValueError(
                f"LoRA adapter for {kernel_path!r} is missing "
                f"{sorted({'a', 'b'} - set(ab))}")
    return grouped


def materialize(
    params: Any,
    lora: Dict[str, Any],
    alpha: float = 16.0,
    rank: Optional[int] = None,
    train: bool = True,
) -> Any:
    """Base params (+stop_gradient when training) with LoRA deltas added.

    Every adapter key must match a kernel path in ``params`` — a silent
    zero-delta merge (adapters saved for a different model / layout) is a
    hard error, matching the reference's peft merge which raises on
    missing target modules (VLM2Vec/src/model.py:194-203).
    """
    lora = normalize_lora(lora)
    if rank is None and lora:
        rank = next(iter(lora.values()))["a"].shape[-1]
    scale = alpha / (rank or 1)
    matched = set()

    def update(path, leaf):
        key = "/".join(_path_names(path))
        if key in lora:
            matched.add(key)
            base = jax.lax.stop_gradient(leaf) if train else leaf
            ab = jnp.asarray(lora[key]["a"]) @ jnp.asarray(lora[key]["b"])
            return base + scale * ab.astype(leaf.dtype)
        return jax.lax.stop_gradient(leaf) if train else leaf

    out = jax.tree_util.tree_map_with_path(update, params)
    unmatched = set(lora) - matched
    if unmatched:
        raise ValueError(
            f"{len(unmatched)}/{len(lora)} LoRA adapter keys matched no "
            f"param path (would merge zero deltas); first few: "
            f"{sorted(unmatched)[:3]}. For a quantized (kernel_q) base, "
            "adapters cannot be materialized — use the unmaterialized "
            "path: model(..., lora_rank=r) + apply({'params': base, "
            "'lora': to_collection(lora)}).")
    return out


def merge_lora(
    params: Any, lora: Dict[str, Any], alpha: float = 16.0
) -> Any:
    """Permanently fold adapters into the base weights (merge_and_unload)."""
    return materialize(params, lora, alpha, train=False)
