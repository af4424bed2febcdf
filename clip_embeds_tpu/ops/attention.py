"""Attention dispatch: Pallas flash attention on TPU, jnp reference elsewhere.

Replaces the reference's external native attention deps — CUDA
flash-attention-2 (VLM2Vec qwen2_vl/modeling_qwen2_vl.py:50-55) and torch SDPA
(open_clip/src/open_clip/transformer.py:161-166) — with a TPU Pallas kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain XLA attention. q,k,v: [B, H, N, D]; mask: bool [B?, 1?, Nq, Nk]."""
    dim = q.shape[-1]
    scale = dim ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        nq, nk = logits.shape[-2], logits.shape[-1]
        causal_mask = jnp.tril(jnp.ones((nq, nk), dtype=bool), k=nk - nq)
        logits = jnp.where(causal_mask, logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Multi-head attention on [B, H, N, D] tensors.

    impl: 'auto' (flash on TPU when shapes allow), 'flash', or 'reference'.
    """
    if impl == "reference":
        return reference_attention(q, k, v, causal=causal, mask=mask)

    use_flash = impl == "flash"
    if impl == "auto":
        use_flash = (
            jax.default_backend() == "tpu"
            and mask is None
            and q.shape[-1] <= 128
            and q.shape[-2] >= 128
        )
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    return reference_attention(q, k, v, causal=causal, mask=mask)
