"""CoCa loss: weighted contrastive + captioning cross-entropy.

Reference: open_clip/src/open_clip/loss.py:196-238 (CoCaLoss) — ClipLoss plus
F.cross_entropy(logits, labels, ignore_index=pad_id) scaled by
caption_loss_weight (default open_clip recipe: caption 2.0, clip 1.0).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .clip_loss import clip_loss, softmax_cross_entropy


def caption_loss(
    logits: jax.Array,   # [B, L, V]
    labels: jax.Array,   # [B, L]
    pad_id: int = 0,
) -> jax.Array:
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_labels = labels.reshape(-1)
    valid = flat_labels != pad_id
    safe = jnp.where(valid, flat_labels, 0)
    ce = softmax_cross_entropy(flat_logits, safe)
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)


def coca_loss(
    model_out: Dict[str, jax.Array],
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
) -> Dict[str, jax.Array]:
    contrastive = clip_loss(
        model_out["image_features"],
        model_out["text_features"],
        model_out["logit_scale"],
    ) * clip_loss_weight
    captioning = caption_loss(
        model_out["logits"], model_out["labels"], pad_id
    ) * caption_loss_weight
    return {
        "contrastive_loss": contrastive,
        "caption_loss": captioning,
        "loss": contrastive + captioning,
    }
