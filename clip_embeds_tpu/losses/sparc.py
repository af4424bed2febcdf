"""SPARC global+local loss and the patch-grouping forward math.

Reference: Patch-Aligned-Contrastive-Learning/model/pacl.py:380-485 (sparc
model forward: token-patch similarity, min-max normalization, sigma threshold,
alignment-weighted patch grouping) and :516-584 (SparcLoss: 0.5*global InfoNCE
+ 1.0*masked token-level pairwise contrastive, both directions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.clip import l2_normalize
from .clip_loss import clip_loss


def sparc_group_patches(
    v_patch_embed: jax.Array,  # [B, P, D]
    l_token_embed: jax.Array,  # [B, T, D]
    sigma: float,
) -> jax.Array:
    """Group patches per text token -> [B, T, D] (pacl.py:453-478)."""
    sim = jnp.einsum(
        "btd,bpd->btp", l_token_embed, v_patch_embed,
        preferred_element_type=jnp.float32,
    )
    sim_min = sim.min(axis=-1, keepdims=True)
    sim_max = sim.max(axis=-1, keepdims=True)
    sim = (sim - sim_min) / (sim_max - sim_min + 1e-8)
    sim = jnp.where(sim < sigma, 0.0, sim)
    weights = sim / (sim.sum(axis=-1, keepdims=True) + 1e-8)
    return jnp.einsum("btp,bpd->btd", weights, v_patch_embed.astype(weights.dtype))


def masked_pairwise_contrastive_loss(
    a: jax.Array,      # [B, L, D]
    b: jax.Array,      # [B, L, D]
    mask: jax.Array,   # [B, L] float, 1 = valid token
    inv_temperature: float,
) -> jax.Array:
    """Per-sample token-to-token InfoNCE with invalid columns masked.

    Reference pacl.py:522-556: CE over [L] classes with identity targets,
    -1e8 added to invalid columns, mean over valid rows.
    """
    logits = jnp.einsum(
        "bmd,bnd->bmn", a, b, preferred_element_type=jnp.float32
    ) * inv_temperature
    logits = logits + ((1.0 - mask) * -1e8)[:, None, :]
    logz = jax.nn.logsumexp(logits, axis=-1)            # [B, L]
    diag = jnp.diagonal(logits, axis1=-2, axis2=-1)     # [B, L]
    per_token = logz - diag
    return (per_token * mask).sum() / mask.sum()


def sparc_loss(
    v_patch_embed: jax.Array,           # [B, P, D] (unnormalized projections)
    l_token_embed: jax.Array,           # [B, T, D] normalized
    l_grouped_v_patch_embed: jax.Array, # [B, T, D] normalized
    language_mask: jax.Array,           # [B, T] float
    temperature: float = 1.0,
    global_weight: float = 0.5,
    local_weight: float = 1.0,
) -> jax.Array:
    inv_t = 1.0 / temperature
    global_img = l2_normalize(v_patch_embed.mean(axis=1))
    global_txt = l2_normalize(l_token_embed.mean(axis=1))
    global_loss = clip_loss(global_img, global_txt, jnp.asarray(inv_t))

    loss_vl = masked_pairwise_contrastive_loss(
        l_grouped_v_patch_embed, l_token_embed, language_mask, inv_t
    )
    loss_lv = masked_pairwise_contrastive_loss(
        l_token_embed, l_grouped_v_patch_embed, language_mask, inv_t
    )
    local_loss = (loss_vl + loss_lv) / 2
    return global_weight * global_loss + local_weight * local_loss
