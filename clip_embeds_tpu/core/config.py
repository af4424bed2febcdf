"""Model configuration dataclasses and the name->config registry.

One dataclass+dict registry replaces the reference's four config idioms
(SURVEY.md §5): open_clip's JSON model_configs (factory.py:69-79), argparse
flags, HF dataclasses, and per-model dict registries. Shapes follow the
reference model_configs/*.json files exactly so converted checkpoints load.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    tower: str = "vit"  # 'vit'|'resnet'|'eva'|'eva02'|'convnext'|'vitamin'|'timm-vit'|'relpos-vit'|'swin'|'mci-vit'|'fastvit'
    resnet_layers: Tuple[int, ...] = ()  # ModifiedResNet stage depths
    convnext_depths: Tuple[int, ...] = ()  # ConvNeXt stage depths
    convnext_dims: Tuple[int, ...] = ()    # ConvNeXt stage widths
    head_proj: str = "linear"  # timm-style head projection: 'linear' | 'mlp'
    head_width: int = 64
    mlp_ratio: float = 4.0
    pool_type: str = "tok"  # 'tok' | 'avg' | 'none'
    # FLIP-style train-time patch dropout (arXiv:2212.00794; reference
    # transformer.py:48-88 PatchDropout, --force-patch-dropout). Fraction of
    # patch tokens dropped per sample during training; CLS always kept.
    patch_dropout: float = 0.0
    no_ln_pre: bool = False
    final_ln_after_pool: bool = False
    # EVA02 tower variants (timm eva.py flags; models/eva.py):
    eva_rope: bool = False              # 2D rotary embed on q/k (cls excluded)
    eva_swiglu: bool = False            # SwiGLU MLP with inner LayerNorm
    eva_attn_inner_norm: bool = False   # LN on attn output before out-proj
    eva_post_norm: bool = False         # post-norm blocks (EVA02-E)
    eva_ref_feat_shape: Tuple[int, int] = ()  # rope coord rescale grid
    # ViTamin hybrid tower (models/vitamin.py): MbConv stage dims/depths;
    # width/layers/head_width/mlp_ratio describe the stage-3 ViT
    vitamin_mbconv_dims: Tuple[int, int] = ()
    vitamin_mbconv_depths: Tuple[int, int] = ()
    # Swin tower (models/swin.py): width = stage-0 embed dim
    swin_depths: Tuple[int, ...] = ()
    swin_heads: Tuple[int, ...] = ()
    swin_window: int = 7
    # FastViT-MCI tower (models/fastvit.py): stage depths/dims
    fastvit_layers: Tuple[int, ...] = ()
    fastvit_dims: Tuple[int, ...] = ()

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    pool_type: str = "argmax"  # 'argmax' | 'first' | 'last' | 'none'
    no_causal_mask: bool = False
    pad_id: int = 0


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    quick_gelu: bool = False
    init_logit_scale: float = 2.6592  # ln(1/0.07)
    init_logit_bias: Optional[float] = None  # set for SigLIP-style models

    def replace(self, **kw) -> "CLIPConfig":
        return dataclasses.replace(self, **kw)


def _cfg(
    embed_dim: int,
    vision: Dict[str, Any],
    text: Dict[str, Any],
    **kw,
) -> CLIPConfig:
    return CLIPConfig(
        embed_dim=embed_dim,
        vision=VisionConfig(**vision),
        text=TextConfig(**text),
        **kw,
    )


# Tower shapes mirror reference open_clip/src/open_clip/model_configs/<name>.json.
MODEL_CONFIGS: Dict[str, CLIPConfig] = {
    "ViT-B-32": _cfg(
        512,
        dict(image_size=224, patch_size=32, width=768, layers=12),
        dict(width=512, heads=8, layers=12),
    ),
    "ViT-B-16": _cfg(
        512,
        dict(image_size=224, patch_size=16, width=768, layers=12),
        dict(width=512, heads=8, layers=12),
    ),
    "ViT-L-14": _cfg(
        768,
        dict(image_size=224, patch_size=14, width=1024, layers=24),
        dict(width=768, heads=12, layers=12),
    ),
    "ViT-L-14-336": _cfg(
        768,
        dict(image_size=336, patch_size=14, width=1024, layers=24),
        dict(width=768, heads=12, layers=12),
    ),
    "ViT-H-14": _cfg(
        1024,
        dict(image_size=224, patch_size=14, width=1280, layers=32, head_width=80),
        dict(width=1024, heads=16, layers=24),
    ),
    "ViT-g-14": _cfg(
        1024,
        dict(image_size=224, patch_size=14, width=1408, layers=40, head_width=88,
             mlp_ratio=4.3637),
        dict(width=1024, heads=16, layers=24),
    ),
    "ViT-bigG-14": _cfg(
        1280,
        dict(image_size=224, patch_size=14, width=1664, layers=48, head_width=104,
             mlp_ratio=4.9231),
        dict(width=1280, heads=20, layers=32),
    ),
    # EVA01-g-14: timm eva_giant_patch14_224 re-expressed natively
    # (models/eva.py EVAVisionTower; BEiT-style qkv bias, no ln_pre,
    # CLS-pool + head projection, LN eps 1e-6).
    "EVA01-g-14": _cfg(
        1024,
        dict(tower="eva", image_size=224, patch_size=14, width=1408,
             layers=40, head_width=88, mlp_ratio=6144 / 1408),
        dict(width=768, heads=12, layers=12),
    ),
}

# ModifiedResNet CLIP family (reference model_configs/RN*.json; layers given
# as a tuple selects the ResNet tower — model.py:105 _build_vision_tower).
MODEL_CONFIGS["RN50"] = _cfg(
    1024,
    dict(tower="resnet", image_size=224, width=64, resnet_layers=(3, 4, 6, 3)),
    dict(width=512, heads=8, layers=12),
)
MODEL_CONFIGS["RN101"] = _cfg(
    512,
    dict(tower="resnet", image_size=224, width=64, resnet_layers=(3, 4, 23, 3)),
    dict(width=512, heads=8, layers=12),
)
MODEL_CONFIGS["RN50x4"] = _cfg(
    640,
    dict(tower="resnet", image_size=288, width=80, resnet_layers=(4, 6, 10, 6)),
    dict(width=640, heads=10, layers=12),
)

# Reward/preference scorers used by t2v clipscore_models: HPSv2 and PickScore
# are plain CLIP ViT-H-14 checkpoints (clipscore_models/{hpsv2,pickscore}
# load open_clip ViT-H-14 / HF CLIP-H weights) — alias the arch so converted
# weights drop in via CLIPScorer.
MODEL_CONFIGS["HPSv2"] = MODEL_CONFIGS["ViT-H-14"]
MODEL_CONFIGS["PickScore"] = MODEL_CONFIGS["ViT-H-14"]

# A tiny config for tests/CI — not in the reference.
MODEL_CONFIGS["test-tiny"] = _cfg(
    64,
    dict(image_size=32, patch_size=16, width=64, layers=2, head_width=32),
    dict(width=64, heads=2, layers=2, vocab_size=49408),
)

# Tiny tower whose WIDTHS match the reference PACL/SPARC ViT-L head branch
# (pacl.py:68-79 hardcodes LayerNorm(1024) + Patch_Projection(1024, 768) +
# text LayerNorm(768)/Linear(768, 768)), so the reference head classes can
# be instantiated unmodified around it in the parity-runbook fixtures while
# depth/patch-count stay test-sized. Not in the reference.
MODEL_CONFIGS["test-pacl-tiny"] = _cfg(
    768,
    dict(image_size=64, patch_size=32, width=1024, layers=1, head_width=64),
    dict(width=768, heads=12, layers=1, vocab_size=49408),
)

# Flagship-SHAPED 2-layer config: ViT-L/14-336 tower dimensions (width 1024,
# head_dim 64, 577 tokens at 336px; text width 768/heads 12) with the depth
# cut to 2 so the multi-chip dry run can certify the production sharding
# layout (dp x tp PartitionSpecs at real shapes) on a virtual mesh without
# real chips. Not in the reference.
MODEL_CONFIGS["test-vitl-2layer"] = _cfg(
    768,
    dict(image_size=336, patch_size=14, width=1024, layers=2, head_width=64),
    dict(width=768, heads=12, layers=2, vocab_size=49408),
)


# (model, pretrained_tag) pairs that use QuickGELU activations. OpenAI weights
# always do (reference factory.py quick_gelu routing / pretrained.py 'openai').
_QUICK_GELU_TAGS = {"openai"}


def get_model_config(name: str, pretrained: Optional[str] = None) -> CLIPConfig:
    """Resolve a model name (+ optional pretrained tag) to a CLIPConfig.

    Hand-written MODEL_CONFIGS take priority; any other of the reference's
    126 model-config names resolves through the data-driven registry
    (core/openclip_registry.py) when its towers are native here.
    """
    key = name.replace("/", "-")
    if key not in MODEL_CONFIGS:
        from .openclip_registry import get_raw_model_config, resolve_clip_config

        if get_raw_model_config(key) is None:
            raise KeyError(
                f"unknown model {name!r}; known: {sorted(MODEL_CONFIGS)} "
                "+ the open_clip registry (core/openclip_registry.py)"
            )
        cfg = resolve_clip_config(key)  # raises NotImplementedError w/ backend
    else:
        cfg = MODEL_CONFIGS[key]
    if pretrained in _QUICK_GELU_TAGS or key.endswith("-quickgelu"):
        cfg = cfg.replace(quick_gelu=True)
    return cfg


def list_models() -> Tuple[str, ...]:
    return tuple(sorted(MODEL_CONFIGS))
