"""clip_embeds_tpu — TPU-native CLIP embedding & evaluation framework.

One coherent JAX/XLA/Pallas package with the capabilities of the reference
lst627/CLIP-Embeds stack (see SURVEY.md for the blueprint).
"""

from .core.config import CLIPConfig, TextConfig, VisionConfig, get_model_config, list_models
from .core.factory import create_model, create_model_and_transforms
from .text.tokenizer import BPETokenizer, get_tokenizer

__version__ = "0.1.0"
