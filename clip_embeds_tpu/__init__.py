"""clip_embeds_tpu — TPU-native CLIP embedding & evaluation framework.

One coherent JAX/XLA/Pallas package with the capabilities of the reference
lst627/CLIP-Embeds stack (see SURVEY.md for the blueprint).
"""

from .core.config import CLIPConfig, TextConfig, VisionConfig, get_model_config, list_models
from .core.factory import create_model, create_model_and_transforms
from .text.tokenizer import BPETokenizer, get_tokenizer

# t2v_metrics-style public scoring surface (reference t2v_metrics/__init__.py)
from .scores.registry import (  # noqa: E402
    get_score_model,
    list_all_clipscore_models,
    list_all_itmscore_models,
    list_all_models,
    list_all_vqascore_models,
)
from .scores.score import (  # noqa: E402
    CLIPScore,
    ITMScore,
    ImageRewardScore,
    InstructBlipVQAScore,
    Score,
    VQAScore,
)

__version__ = "0.2.0"
