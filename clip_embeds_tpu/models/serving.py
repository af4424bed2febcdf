"""Fused serving path: CLIP image encoding through one-kernel-per-block.

Reads the standard CLIP param tree (models/vit.py layout) and replays
encode_image with ops/fused_block.py — the whole residual stream stays in
VMEM per block, so the HBM layout traffic of the composable path (qkv
splits, head transposes, LN/GELU passes) disappears. Numerics match the
composable path to bf16 tolerance; use for inference/serving only (the
composable path owns training).

The sequence is padded once to a 128-multiple before the block stack
(kv_valid masks padded keys; padded query rows are discarded after), so all
24 blocks run at a static MXU-friendly shape.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.fused_block import fused_block, fused_block_supported
from .clip import l2_normalize
from .vit import patchify


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_encode_image(
    model,                        # models.clip.CLIP (vit tower)
    params: Dict[str, Any],
    images: jax.Array,            # [B, S, S, 3]
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """encode_image via fused block kernels; returns [B, embed_dim]."""
    cfg = model.cfg.vision
    if cfg.tower != "vit":
        raise NotImplementedError("fused serving path covers ViT towers")
    p = params["visual"]
    quick = model.cfg.quick_gelu
    b = images.shape[0]

    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"].astype(dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    n_valid = x.shape[1]

    if not cfg.no_ln_pre:
        ln = p["ln_pre"]
        x = _ln_affine(x, ln["scale"], ln["bias"])

    align = 8 if interpret else 128
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    blocks = p["transformer"]
    for i in range(cfg.layers):
        bp = blocks[f"resblocks_{i}"]
        x = fused_block(
            x,
            bp["attn"]["in_proj"]["kernel"], bp["attn"]["in_proj"]["bias"],
            bp["attn"]["out_proj"]["kernel"], bp["attn"]["out_proj"]["bias"],
            bp["mlp"]["c_fc"]["kernel"], bp["mlp"]["c_fc"]["bias"],
            bp["mlp"]["c_proj"]["kernel"], bp["mlp"]["c_proj"]["bias"],
            jnp.stack([bp["ln_1"]["scale"], bp["ln_1"]["bias"]]),
            jnp.stack([bp["ln_2"]["scale"], bp["ln_2"]["bias"]]),
            heads=cfg.heads, kv_valid=n_valid, quick_gelu=quick,
            interpret=interpret,
        )
    x = x[:, :n_valid]

    lnp = p["ln_post"]
    if cfg.final_ln_after_pool:
        pooled = _pool(x, cfg.pool_type)
        pooled = _ln_affine(pooled, lnp["scale"], lnp["bias"])
    else:
        x = _ln_affine(x, lnp["scale"], lnp["bias"])
        pooled = _pool(x, cfg.pool_type)
    pooled = pooled @ p["proj"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled


def fused_path_available(model) -> bool:
    cfg = model.cfg.vision
    if cfg.tower != "vit":
        return False
    n = _round_up(cfg.num_patches + 1, 128)
    return fused_block_supported(n, cfg.width, cfg.heads, cfg.mlp_ratio)


def _ln_affine(x, scale, bias, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _pool(x, pool_type: str):
    if pool_type == "avg":
        return x[:, 1:].mean(axis=1)
    if pool_type == "tok":
        return x[:, 0]
    raise NotImplementedError(pool_type)
