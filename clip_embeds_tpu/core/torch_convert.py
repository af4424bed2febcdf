"""Convert PyTorch CLIP checkpoints (open_clip / OpenAI layout) to JAX params.

The reference's ~154-entry pretrained registry (open_clip pretrained.py) is an
*input format*: this module maps a torch ``state_dict`` onto the flax param
tree of :class:`clip_embeds_tpu.models.clip.CLIP`. Key layout being consumed is
the reference CLIP class (open_clip/src/open_clip/model.py:222-301 — text
modules flattened at top level, packed ``in_proj_weight`` per block per
transformer.py:117).

Torch ``nn.Linear`` stores ``y = x @ W.T + b`` — flax ``Dense`` kernels are the
transpose. The patchify conv (transformer.py:549-556) becomes a dense kernel
with (kh, kw, cin) row ordering, matching ``models.vit.patchify``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().float().numpy()


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    in_proj_w = _np(sd[prefix + ".attn.in_proj_weight"])  # [3W, W]
    in_proj_b = _np(sd[prefix + ".attn.in_proj_bias"])
    return {
        "ln_1": _layernorm(sd, prefix + ".ln_1"),
        "attn": {
            "in_proj": {"kernel": in_proj_w.T, "bias": in_proj_b},
            "out_proj": _linear(sd, prefix + ".attn.out_proj"),
        },
        "ln_2": _layernorm(sd, prefix + ".ln_2"),
        "mlp": {
            "c_fc": _linear(sd, prefix + ".mlp.c_fc"),
            "c_proj": _linear(sd, prefix + ".mlp.c_proj"),
        },
    }


def _transformer(sd: Mapping[str, Any], prefix: str, layers: int) -> Dict[str, Any]:
    return {
        f"resblocks_{i}": _block(sd, f"{prefix}.resblocks.{i}")
        for i in range(layers)
    }


def _count_layers(sd: Mapping[str, Any], prefix: str) -> int:
    n = 0
    while f"{prefix}.resblocks.{n}.ln_1.weight" in sd:
        n += 1
    return n


def convert_clip_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """open_clip CLIP state_dict -> flax params dict for models.clip.CLIP."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    conv_w = _np(sd["visual.conv1.weight"])  # [W, 3, p, p]
    width, cin, p, _ = conv_w.shape
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(p * p * cin, width)

    v_layers = _count_layers(sd, "visual.transformer")
    t_layers = _count_layers(sd, "transformer")

    visual = {
        "patch_embed": {"kernel": patch_kernel},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": _layernorm(sd, "visual.ln_pre"),
        "transformer": _transformer(sd, "visual.transformer", v_layers),
        "ln_post": _layernorm(sd, "visual.ln_post"),
        "proj": _np(sd["visual.proj"]),
    }
    text = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "transformer": _transformer(sd, "transformer", t_layers),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    params: Dict[str, Any] = {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    if "logit_bias" in sd:
        params["logit_bias"] = _np(sd["logit_bias"]).reshape(())
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .pt/.pth checkpoint file and convert to flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return convert_clip_state_dict(ckpt)
