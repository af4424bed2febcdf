"""VLM backbone registry: HF model name -> backbone family -> native stack.

Reference: VLM2Vec/src/vlm_backbone/vlm_dict.py (name->family table) and the
per-family branches of MMEBModel.build (VLM2Vec/src/model.py:54-144). Here
each family resolves to (model class, default config factory, HF state-dict
converter) so ``train/arguments.py --model_backbone`` and the eval drivers
dispatch without per-call imports.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

# reference table (vlm_dict.py) + the qwen entries its qwen2_vl/qwen2_5_vl
# backbone dirs imply
HF_MODEL_TO_VLM_BACKBONE: Dict[str, str] = {
    "microsoft/Phi-3.5-vision-instruct": "phi3_v",
    "TIGER-Lab/VLM2Vec-Full": "phi3_v",
    "TIGER-Lab/VLM2Vec-LoRA": "phi3_v",
    "llava-hf/llava-v1.6-mistral-7b-hf": "llava_next",
    "TIGER-Lab/VLM2Vec-LLaVa-Next": "llava_next",
    "llava-hf/llava-1.5-7b-hf": "llava_15",
    "Qwen/Qwen2-VL-2B-Instruct": "qwen2_vl",
    "Qwen/Qwen2-VL-7B-Instruct": "qwen2_vl",
    "Qwen/Qwen2.5-VL-3B-Instruct": "qwen2_5_vl",
    "Qwen/Qwen2.5-VL-7B-Instruct": "qwen2_5_vl",
}


class Backbone(NamedTuple):
    model_cls: Any
    config_factory: Callable[[], Any]
    converter: Callable[[Dict[str, Any]], Dict[str, Any]]


def get_backbone(name: str) -> Backbone:
    """Resolve a backbone family (or an HF model name) to its native stack."""
    family = HF_MODEL_TO_VLM_BACKBONE.get(name, name)
    if family == "llava_15":
        from ..core.torch_convert import convert_llava_state_dict
        from .llava import Llava, LlavaConfig

        return Backbone(Llava, LlavaConfig, convert_llava_state_dict)
    if family == "llava_next":
        from ..core.torch_convert import convert_llava_next_state_dict
        from .llava_next import LlavaNext, LlavaNextConfig

        return Backbone(
            LlavaNext, LlavaNextConfig, convert_llava_next_state_dict
        )
    if family == "phi3_v":
        from .phi3_v import Phi3V, Phi3VConfig, convert_phi3_v_state_dict

        return Backbone(Phi3V, Phi3VConfig, convert_phi3_v_state_dict)
    if family == "qwen2_vl":
        from ..core.torch_convert import convert_qwen2_vl_state_dict
        from .qwen2_vl import Qwen2VL, Qwen2VLConfig

        return Backbone(Qwen2VL, Qwen2VLConfig, convert_qwen2_vl_state_dict)
    if family == "qwen2_5_vl":
        from ..core.torch_convert import convert_qwen2_5_vl_state_dict
        from .qwen2_vl import Qwen25VL, Qwen25VLConfig

        return Backbone(
            Qwen25VL, Qwen25VLConfig, convert_qwen2_5_vl_state_dict
        )
    raise KeyError(
        f"unknown backbone {name!r}; families: llava_15, llava_next, "
        "phi3_v, qwen2_vl, qwen2_5_vl"
    )
