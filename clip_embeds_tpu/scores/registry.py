"""Score-model name registry — the t2v_metrics public dispatch surface.

Reference: t2v_metrics/__init__.py:11-20 (get_score_model routes a model
name to VQAScore/CLIPScore/ITMScore) with the per-family name tables from
models/vqascore_models/{llava,clip_t5,llava16,instructblip,gpt4v}_model.py
and models/{clipscore,itmscore}_models/*.py. CLIPScore names follow the
reference's '<pretrained>:<arch>' format over the full pretrained table
(clip_model.py:9).

Most families need converted checkpoints (zero-egress environment), so
``get_score_model`` returns a live Score only for families whose weights
are supplied (or the CLIP family, which can run random-init for plumbing
tests); otherwise it raises with the exact constructor to call.
"""

from __future__ import annotations

from typing import List, Optional

# vqascore_models name tables (reference file:line in module docstring)
LLAVA_MODELS = [
    "llava-v1.5-13b", "llava-v1.5-7b", "sharegpt4v-7b", "sharegpt4v-13b",
]
LLAVA_LLAMA_MODELS = ["llava-phi-3", "llava-llama-3"]
LLAVA16_MODELS = ["llava-v1.6-13b"]
CLIP_T5_MODELS = [
    "clip-flant5-xxl", "clip-flant5-xl",
    "clip-flant5-xxl-no-system", "clip-flant5-xxl-no-system-no-user",
]
INSTRUCTBLIP_MODELS = ["instructblip-flant5-xxl", "instructblip-flant5-xl"]
GPT4V_MODELS = ["gpt-4-turbo", "gpt-4o"]

BLIP2_ITC_MODELS = ["blip2-itc", "blip2-itc-vitL", "blip2-itc-coco"]
HPSV2_MODELS = ["hpsv2"]
PICKSCORE_MODELS = ["pickscore-v1"]
BLIP2_ITM_MODELS = ["blip2-itm", "blip2-itm-vitL", "blip2-itm-coco"]
IMAGE_REWARD_MODELS = ["image-reward-v1"]


def list_all_vqascore_models() -> List[str]:
    return (LLAVA_MODELS + LLAVA_LLAMA_MODELS + LLAVA16_MODELS
            + CLIP_T5_MODELS + INSTRUCTBLIP_MODELS + GPT4V_MODELS)


def list_all_clipscore_models() -> List[str]:
    from ..core.openclip_registry import list_pretrained

    clip = [f"{tag}:{arch}" for arch, tag in list_pretrained()]
    return clip + BLIP2_ITC_MODELS + HPSV2_MODELS + PICKSCORE_MODELS


def list_all_itmscore_models() -> List[str]:
    return BLIP2_ITM_MODELS + IMAGE_REWARD_MODELS


def list_all_models() -> List[str]:
    return (list_all_vqascore_models() + list_all_clipscore_models()
            + list_all_itmscore_models())


def get_score_model(
    model: str = "clip-flant5-xxl",
    checkpoint: Optional[str] = None,
    **kwargs,
):
    """Resolve a score-model name to a live Score (reference __init__.py:14).

    CLIP-family '<tag>:<arch>' names build immediately (random init when the
    checkpoint is absent). The VQA/ITM families require converted weights;
    without them this raises naming the constructor to use.
    """
    if ":" in model:
        tag, arch = model.split(":", 1)
        import jax.numpy as jnp

        from ..core.factory import create_model
        from .score import CLIPScore

        m, params = create_model(arch, checkpoint or tag,
                                 dtype=jnp.bfloat16)
        return CLIPScore(m, params, **kwargs)
    if model in GPT4V_MODELS or model in (
        list_all_vqascore_models() + list_all_itmscore_models()
        + BLIP2_ITC_MODELS
    ):
        from .build import build_score_model

        if model in GPT4V_MODELS or checkpoint is not None:
            return build_score_model(model, checkpoint, **kwargs)
        raise NotImplementedError(
            f"{model!r} needs converted weights (zero-egress environment): "
            "run the family converter in core/torch_convert.py, write a "
            "bundle with scores.build.save_score_bundle, and pass "
            "checkpoint=<bundle dir>"
        )
    if model in HPSV2_MODELS + PICKSCORE_MODELS:
        arch, variant = CLIPSCORE_ALIASES[model]
        import jax.numpy as jnp

        from ..core.factory import create_model
        from .score import CLIPScore

        m, params = create_model(arch, checkpoint, dtype=jnp.bfloat16)
        return CLIPScore(m, params, preprocess_variant=variant, **kwargs)
    raise KeyError(f"unknown score model {model!r}")


# Alias -> (CLIP arch, preprocess variant). Both scorers are
# plain CLIP towers scored by cosine:
# * HPSv2 is a tuned open_clip ViT-H-14 whose hpsv2.score() returns
#   diag(img @ txt.T) of the normalized features
#   (reference clipscore_models/hpsv2_model.py:9-47; the hpsv2 package's
#   score() body). Preprocess = open_clip ViT-H-14 default (shortest-edge
#   bicubic 224 + center crop, OpenAI stats).
# * PickScore_v1 is a tuned laion/CLIP-ViT-H-14-laion2B-s32B-b79K scored by
#   normalized-feature dot product (clipscore_models/pickscore_model.py:12-69);
#   its HF CLIPProcessor applies the same shortest+crop+OpenAI-stats
#   preprocessing at 224.
# Pass checkpoint=<converted .npz / torch .pt> (core/torch_convert.py handles
# both the open_clip and HF CLIP state-dict layouts); without one the tower
# is random-init, which still exercises the full plumbing.
CLIPSCORE_ALIASES = {
    "hpsv2": ("ViT-H-14", "clip"),
    "pickscore-v1": ("ViT-H-14", "clip"),
}
