"""Phi-3 decoder (flax.linen) — the VLM2Vec Phi-3-V text backbone.

Reference: VLM2Vec/src/vlm_backbone/phi3_v/modeling_phi3_v.py (vendored HF
Phi-3 with vision): Llama-family decoder with *packed* projections —
``qkv_proj`` [q;k;v] and ``gate_up_proj`` [gate;up] — RMSNorm, rotate-half
RoPE (su-scaled long-rope is a config extension, not needed at the <=4k
lengths the reference uses), SiLU-gated MLP, optional GQA.

Reuses the Llama building blocks; only the projection packing differs, so
the converter maps HF Phi-3 checkpoints by splitting the packed weights into
the Llama layout — one model implementation serves both families.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..core.torch_convert import _np  # shared tensor helper
from .llama import LlamaConfig, LlamaForCausalLM


def phi3_mini_config() -> LlamaConfig:
    """microsoft/Phi-3-mini (the Phi-3.5-V text trunk) shape."""
    return LlamaConfig(
        vocab_size=32064,
        hidden_size=3072,
        intermediate_size=8192,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        max_position_embeddings=4096,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )


def Phi3ForCausalLM(cfg: LlamaConfig, **kw) -> LlamaForCausalLM:
    """Phi-3 is architecturally Llama once projections are unpacked."""
    return LlamaForCausalLM(cfg, **kw)


def convert_phi3_state_dict(
    sd: Mapping[str, Any], cfg: LlamaConfig, prefix: str = ""
) -> Dict[str, Any]:
    """HF Phi3ForCausalLM state_dict -> params for LlamaForCausalLM.

    Splits qkv_proj [q_dim + 2*kv_dim, hidden] and gate_up_proj
    [2*intermediate, hidden] into the separate-projection layout.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.kv_heads * cfg.head_dim

    n = 0
    while f"model.layers.{n}.input_layernorm.weight" in sd:
        n += 1
    layers: Dict[str, Any] = {}
    for i in range(n):
        p = f"model.layers.{i}"
        qkv = _np(sd[f"{p}.self_attn.qkv_proj.weight"])
        qw, kw_, vw = (
            qkv[:q_dim], qkv[q_dim : q_dim + kv_dim], qkv[q_dim + kv_dim :]
        )
        gate_up = _np(sd[f"{p}.mlp.gate_up_proj.weight"])
        gw, uw = gate_up[: cfg.intermediate_size], gate_up[cfg.intermediate_size :]
        layers[f"layers_{i}"] = {
            "input_layernorm": {"weight": _np(sd[f"{p}.input_layernorm.weight"])},
            "post_attention_layernorm": {
                "weight": _np(sd[f"{p}.post_attention_layernorm.weight"])
            },
            "self_attn": {
                "q_proj": {"kernel": qw.T},
                "k_proj": {"kernel": kw_.T},
                "v_proj": {"kernel": vw.T},
                "o_proj": {"kernel": _np(sd[f"{p}.self_attn.o_proj.weight"]).T},
            },
            "mlp": {
                "gate_proj": {"kernel": gw.T},
                "up_proj": {"kernel": uw.T},
                "down_proj": {"kernel": _np(sd[f"{p}.mlp.down_proj.weight"]).T},
            },
        }
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": _np(sd["model.embed_tokens.weight"])},
        "model": dict(layers, norm={"weight": _np(sd["model.norm.weight"])}),
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return params
