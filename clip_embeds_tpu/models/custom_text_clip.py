"""CustomTextCLIP: ViT vision tower + HF-style text tower.

Reference: open_clip's CustomTextCLIP (model.py:438-...) pairs any vision
tower with an HFTextEncoder (hf_model.py:96) for the roberta-/xlm-roberta-/
mt5-* model configs (e.g. model_configs/roberta-ViT-B-32.json: hf_model_name
+ mean_pooler + proj 'mlp'). Here the text side is one of the native towers
in models/hf_text.py (T5/mT5 encoder or post-LN BERT/RoBERTa) and the vision
side reuses models/vit.py. ``build_custom_text_clip`` resolves any of the
registry's hf-text archs into a ready model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VisionConfig
from .clip import l2_normalize
from .hf_text import BertTextConfig, BertTextTower, T5TextTower
from .t5 import T5Config
from .vit import VisionTransformer

Dtype = Any

# public shapes for the registry's hf_model_name text towers
HF_TEXT_SHAPES: Dict[str, Dict[str, Any]] = {
    "roberta-base": dict(
        kind="bert", vocab_size=50265, hidden_size=768, num_layers=12,
        num_heads=12, intermediate_size=3072, max_position_embeddings=514,
    ),
    "xlm-roberta-base": dict(
        kind="bert", vocab_size=250002, hidden_size=768, num_layers=12,
        num_heads=12, intermediate_size=3072, max_position_embeddings=514,
    ),
    "xlm-roberta-large": dict(
        kind="bert", vocab_size=250002, hidden_size=1024, num_layers=24,
        num_heads=16, intermediate_size=4096, max_position_embeddings=514,
    ),
    "google/mt5-base": dict(
        kind="t5", vocab_size=250112, d_model=768, d_kv=64, d_ff=2048,
        num_layers=12, num_heads=12,
    ),
    "google/mt5-xl": dict(
        kind="t5", vocab_size=250112, d_model=2048, d_kv=64, d_ff=5120,
        num_layers=24, num_heads=32,
    ),
    "facebook/nllb-200-distilled-600M": dict(
        kind="m2m100", vocab_size=256206, d_model=1024, num_layers=12,
        num_heads=16, ffn_dim=4096,
    ),
    "facebook/nllb-200-distilled-1.3B": dict(
        kind="m2m100", vocab_size=256206, d_model=2048, num_layers=24,
        num_heads=16, ffn_dim=8192,
    ),
}


@dataclasses.dataclass(frozen=True)
class CustomTextCLIPConfig:
    embed_dim: int
    vision: VisionConfig
    hf_model_name: str
    pooler: str = "mean"       # hf_pooler_type mean_pooler
    quick_gelu: bool = False
    init_logit_scale: float = 2.6592


class CustomTextCLIP(nn.Module):
    cfg: CustomTextCLIPConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        self.visual = VisionTransformer(
            cfg.vision, cfg.embed_dim, cfg.quick_gelu, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=self.remat,
        )
        shape = dict(HF_TEXT_SHAPES[cfg.hf_model_name])
        kind = shape.pop("kind")
        if kind == "t5":
            self.text = T5TextTower(
                T5Config(**shape), cfg.embed_dim, pooler=cfg.pooler,
                dtype=self.dtype,
            )
        elif kind == "m2m100":
            from .hf_text import M2M100Config, M2M100TextTower

            self.text = M2M100TextTower(
                M2M100Config(**shape), cfg.embed_dim, pooler=cfg.pooler,
                dtype=self.dtype,
            )
        else:
            self.text = BertTextTower(
                BertTextConfig(**shape), cfg.embed_dim, pooler=cfg.pooler,
                dtype=self.dtype,
            )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(cfg.init_logit_scale), (),
        )

    def encode_image(self, images: jax.Array, normalize: bool = False):
        pooled, _ = self.visual(images)
        return l2_normalize(pooled) if normalize else pooled

    def encode_text(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        normalize: bool = False,
    ):
        pooled = self.text(input_ids, attention_mask)
        return l2_normalize(pooled) if normalize else pooled

    def __call__(
        self,
        images: Optional[jax.Array] = None,
        input_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {
            "logit_scale": jnp.exp(self.logit_scale)
        }
        if images is not None:
            out["image_features"] = self.encode_image(images, normalize=True)
        if input_ids is not None:
            out["text_features"] = self.encode_text(
                input_ids, attention_mask, normalize=True
            )
        return out


def build_custom_text_clip(
    name: str, dtype: Any = jnp.float32, **kw
) -> CustomTextCLIP:
    """Resolve an hf-text registry arch (roberta-ViT-B-32, mt5-base-ViT-B-32,
    xlm-roberta-large-ViT-H-14, ...) into a CustomTextCLIP module."""
    from ..core.openclip_registry import classify_model, get_raw_model_config

    backend, detail = classify_model(name)
    if backend != "hf-text":
        raise NotImplementedError(f"{name!r} is not an hf-text config")
    raw = get_raw_model_config(name)
    v = raw["vision_cfg"]
    vision = VisionConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 16),
        width=v.get("width", 768),
        layers=v.get("layers", 12),
        head_width=v.get("head_width", 64),
    )
    pooler = {
        "mean_pooler": "mean", "cls_pooler": "first",
    }.get(raw["text_cfg"].get("hf_pooler_type", "mean_pooler"), "mean")
    cfg = CustomTextCLIPConfig(
        embed_dim=raw["embed_dim"],
        vision=vision,
        hf_model_name=raw["text_cfg"]["hf_model_name"],
        pooler=pooler,
        quick_gelu=raw.get("quick_gelu", False),
    )
    return CustomTextCLIP(cfg, dtype=dtype, **kw)
