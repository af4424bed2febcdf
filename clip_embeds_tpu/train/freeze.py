"""Partial-tower freezing labels (LiT-style lock flags).

Reference semantics (open_clip model.py lock_image_tower /
transformer.py:388-419 Transformer.lock, main.py:236-247):

* --lock-image freezes the visual tower; --lock-image-unlocked-groups N
  leaves the LAST N groups trainable, where the group list is
  [embeddings (patch/cls/pos/ln_pre), resblocks_0 … resblocks_{L-1},
  ln_post(+proj)].
* --lock-text freezes the text tower; --lock-text-unlocked-layers N leaves
  the last N resblocks plus ln_final/text_projection trainable;
  --lock-text-freeze-layer-norm extends the freeze to LayerNorm params
  inside the locked region (when unset, LN params keep training — the
  reference's freeze_layer_norm=False path).

Returns an optax.multi_transform label tree: 'train' | 'freeze'.
"""

from __future__ import annotations

import re
from typing import Any, Dict

_EMBED_KEYS = {
    "patch_embed", "class_embedding", "positional_embedding", "ln_pre",
    "token_embedding",
}
_FINAL_VISION_KEYS = {"ln_post", "proj"}
_FINAL_TEXT_KEYS = {"ln_final", "text_projection"}


def _block_index(key: str) -> int | None:
    m = re.fullmatch(r"resblocks_(\d+)", key)
    return int(m.group(1)) if m else None


def tower_freeze_labels(
    params: Dict[str, Any],
    cfg,
    lock_image: bool = False,
    lock_image_unlocked_groups: int = 0,
    lock_text: bool = False,
    lock_text_unlocked_layers: int = 0,
    lock_text_freeze_layer_norm: bool = False,
) -> Dict[str, Any]:
    n_vis = getattr(cfg.vision, "layers", 0)
    n_txt = getattr(cfg.text, "layers", 0)
    # group list: embeddings, L blocks, final -> total L+2; unlocked_groups
    # counts from the end
    vis_groups = n_vis + 2
    first_trainable_vis_group = vis_groups - lock_image_unlocked_groups

    def vision_label(path) -> str:
        keys = [getattr(pp, "key", "") for pp in path]
        if _block_index(keys[1]) is None and keys[1] == "transformer":
            idx = _block_index(keys[2])
            group = 1 + (idx if idx is not None else 0)
        elif keys[1] in _FINAL_VISION_KEYS:
            group = vis_groups - 1
        else:
            group = 0
        return "train" if group >= first_trainable_vis_group else "freeze"

    def text_label(path) -> str:
        keys = [getattr(pp, "key", "") for pp in path]
        sub = keys[1]
        if sub in _FINAL_TEXT_KEYS:
            unlocked = lock_text_unlocked_layers > 0
        elif sub == "transformer":
            idx = _block_index(keys[2]) or 0
            unlocked = idx >= n_txt - lock_text_unlocked_layers
        else:
            unlocked = False
        if not unlocked and not lock_text_freeze_layer_norm:
            # LN params stay trainable unless the freeze flag extends to them
            if any(k.startswith("ln_") or k in ("ln_1", "ln_2") for k in keys):
                return "train"
        return "train" if unlocked else "freeze"

    import jax

    def label(path, _leaf) -> str:
        top = getattr(path[0], "key", "")
        if lock_image and top == "visual":
            return vision_label(path)
        if lock_text and top == "text":
            return text_label(path)
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)
