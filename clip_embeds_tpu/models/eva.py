"""EVA ViT tower (timm `eva_giant_patch14_224` family) for EVA01-g-14 CLIP.

Reference: open_clip/src/open_clip/model_configs/EVA01-g-14.json routes the
vision side through timm (timm_model_name eva_giant_patch14_224, pool
'token', proj null) wrapped by TimmModel (timm_model.py:58-66: with proj null
the timm classifier head Linear(width, embed_dim) IS the projection and the
trunk pools the CLS token). Architecture (timm eva.py, EVA-01 giant variant):

* biased conv patchify, prepended CLS token, learned abs pos-embed, NO ln_pre
* pre-norm blocks with BEiT-style fused qkv whose bias is
  [q_bias; zeros; v_bias] (k gets no bias), standard GELU MLP, LN eps 1e-6
* final LayerNorm `norm` -> CLS pool -> `head` linear to embed_dim

Shape for EVA01-g: width 1408, depth 40, heads 16, mlp 6144, patch 14 @ 224.
The converter consumes the open_clip `visual.trunk.*` checkpoint layout.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VisionConfig
from .layers import Transformer
from .vit import patchify

Dtype = Any


def eva_giant_config() -> VisionConfig:
    return VisionConfig(
        image_size=224, patch_size=14, width=1408, layers=40, head_width=88,
        mlp_ratio=6144 / 1408, tower="eva",
    )


class EVAVisionTower(nn.Module):
    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B, S, S, 3] -> (pooled [B, embed_dim], patch tokens [B, N, W])."""
        cfg = self.cfg
        b = images.shape[0]
        x = patchify(images.astype(self.dtype), cfg.patch_size)
        x = nn.Dense(cfg.width, use_bias=True, dtype=self.dtype,
                     name="patch_embed")(x)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (cfg.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width)), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (x.shape[1], cfg.width),
        )
        x = x + pos.astype(self.dtype)
        x = Transformer(
            cfg.width, cfg.layers, cfg.heads, cfg.mlp_ratio,
            quick_gelu=False, dtype=self.dtype, attn_impl=self.attn_impl,
            remat=self.remat, ln_eps=1e-6, name="blocks",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        pooled = nn.Dense(self.embed_dim, dtype=self.dtype, name="head")(
            x[:, 0]
        )
        return pooled, x[:, 1:]


def convert_eva_trunk_state_dict(
    sd: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """open_clip EVA checkpoint (visual.trunk.*) -> EVAVisionTower params.

    Handles both fused-bias (qkv.bias) and BEiT-style split-bias
    (q_bias/v_bias, zero k) layouts."""
    import numpy as np

    from ..core.torch_convert import _layernorm, _linear, _np

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    conv_w = _np(sd["patch_embed.proj.weight"])  # [W, 3, p, p]
    width, cin, p, _ = conv_w.shape

    n = 0
    while f"blocks.{n}.norm1.weight" in sd:
        n += 1
    blocks: Dict[str, Any] = {}
    for i in range(n):
        pre = f"blocks.{i}"
        qkv_w = _np(sd[f"{pre}.attn.qkv.weight"])
        if f"{pre}.attn.qkv.bias" in sd:
            qkv_b = _np(sd[f"{pre}.attn.qkv.bias"])
        else:
            q_b = _np(sd[f"{pre}.attn.q_bias"])
            v_b = _np(sd[f"{pre}.attn.v_bias"])
            qkv_b = np.concatenate([q_b, np.zeros_like(q_b), v_b])
        blocks[f"resblocks_{i}"] = {
            "ln_1": _layernorm(sd, f"{pre}.norm1"),
            "attn": {
                "in_proj": {"kernel": qkv_w.T, "bias": qkv_b},
                "out_proj": _linear(sd, f"{pre}.attn.proj"),
            },
            "ln_2": _layernorm(sd, f"{pre}.norm2"),
            "mlp": {
                "c_fc": _linear(sd, f"{pre}.mlp.fc1"),
                "c_proj": _linear(sd, f"{pre}.mlp.fc2"),
            },
        }
    return {
        "patch_embed": {
            "kernel": conv_w.transpose(2, 3, 1, 0).reshape(p * p * cin, width),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["cls_token"]).reshape(-1),
        "pos_embed": _np(sd["pos_embed"]).reshape(-1, width),
        "blocks": blocks,
        "norm": _layernorm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
