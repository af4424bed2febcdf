"""Encoder-LM text towers for CLIP (the reference's HFTextEncoder role).

Reference: open_clip/src/open_clip/hf_model.py:96 — wraps an HF AutoModel
(mt5, roberta, ...) with a pooler ('mean_pooler' default, 'cls_pooler') and an
MLP projection to the CLIP embed dim. Here the two encoder families already in
the framework are reused:

* ``T5TextTower`` — T5/mT5 encoder stack (models/t5.py), the tower behind the
  reference's mt5-base/xl CLIP configs (test_training_simple.py trains one).
* ``BertTextTower`` — post-LN BERT encoder built from the Q-Former blocks
  (models/blip2.py), the roberta-style family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blip2 import BertFFN, BertSelfAttention
from .layers import exact_gelu
from .t5 import T5Config, T5Stack

Dtype = Any


def mean_pool(hidden: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Masked mean over tokens (hf_model.py MeanPooler)."""
    if mask is None:
        return hidden.mean(axis=1)
    m = mask.astype(hidden.dtype)[..., None]
    return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)


class MLPProj(nn.Module):
    """hidden -> (hidden+embed)//2 -> embed with GELU (hf_model.py proj='mlp')."""

    embed_dim: int
    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = (self.hidden_size + self.embed_dim) // 2
        x = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = exact_gelu(x)
        return nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                        name="fc2")(x)


class T5TextTower(nn.Module):
    cfg: T5Config
    embed_dim: int
    pooler: str = "mean"  # 'mean' | 'first'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = nn.Embed(
            self.cfg.vocab_size, self.cfg.d_model,
            embedding_init=nn.initializers.normal(1.0), dtype=self.dtype,
            name="shared",
        )(input_ids)
        hidden = T5Stack(self.cfg, is_decoder=False, dtype=self.dtype,
                         name="encoder")(embeds, attention_mask)
        pooled = (
            hidden[:, 0] if self.pooler == "first"
            else mean_pool(hidden, attention_mask)
        )
        return MLPProj(self.embed_dim, self.cfg.d_model, dtype=self.dtype,
                       name="proj")(pooled)


@dataclasses.dataclass(frozen=True)
class BertTextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    layer_norm_eps: float = 1e-5


class BertTextTower(nn.Module):
    cfg: BertTextConfig
    embed_dim: int
    pooler: str = "mean"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        n = input_ids.shape[1]
        x = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02), dtype=self.dtype,
            name="word_embeddings",
        )(input_ids)
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02), dtype=self.dtype,
            name="position_embeddings",
        )(jnp.arange(n))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embed_ln")(x)
        mask = attention_mask[:, None, None, :] if attention_mask is not None else None
        for i in range(cfg.num_layers):
            x = BertSelfAttention(
                cfg.hidden_size, cfg.num_heads, cfg.layer_norm_eps,
                dtype=self.dtype, name=f"layer_{i}_attention",
            )(x, mask=mask)
            x = BertFFN(
                cfg.hidden_size, cfg.intermediate_size, cfg.layer_norm_eps,
                dtype=self.dtype, name=f"layer_{i}_ffn",
            )(x)
        pooled = x[:, 0] if self.pooler == "first" else mean_pool(
            x, attention_mask
        )
        return MLPProj(self.embed_dim, cfg.hidden_size, dtype=self.dtype,
                       name="proj")(pooled)
