"""VLM2Vec embedding training: LoRA + contrastive loss + GradCache.

Reference: VLM2Vec/train.py + src/trainer.py (GradCacheTrainer) + src/loss.py
DistributedContrastiveLoss (T=0.02). The run recipe (scripts/llava_1.5/
run_train.sh:3-15): bs 64/GPU, grad_cache chunk 1, lr 2e-5 linear, 1000 steps.
Here the trainable state is the LoRA adapter tree; the frozen LLaVA base rides
under stop_gradient inside ``materialize``, and GradCache chunks the encoder
passes (train/grad_cache.py) exactly like the torch 2-pass engine.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..losses.clip_loss import embedding_contrastive_loss
from ..models.llava import Llava
from ..models.lora import materialize
from .grad_cache import cache_grad_step
from .steps import TrainState


def make_vlm2vec_train_step(
    model: Llava,
    base_params: Any,
    lora_alpha: float = 16.0,
    temperature: float = 0.02,
    grad_cache_chunks: int = 0,
    bidirectional: bool = False,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Train step over a LoRA adapter tree.

    batch: qry_ids/qry_mask/qry_pixels + tgt_ids/tgt_mask (data/mmeb.py).
    """

    def encode(lora, batch):
        params = materialize(base_params, lora, lora_alpha, train=True)
        qry = model.apply(
            {"params": params}, batch["qry_ids"], batch["qry_pixels"],
            batch["qry_mask"], method="embed_last_token",
        )
        tgt = model.apply(
            {"params": params}, batch["tgt_ids"], None, batch["tgt_mask"],
            method="embed_last_token",
        )
        return {"qry": qry, "tgt": tgt}

    def rep_loss(reps):
        loss = embedding_contrastive_loss(
            reps["qry"], reps["tgt"], temperature
        )
        if bidirectional:
            loss = (loss + embedding_contrastive_loss(
                reps["tgt"], reps["qry"], temperature
            )) / 2
        return loss

    def train_step(state: TrainState, batch):
        if grad_cache_chunks > 1:
            loss, grads = cache_grad_step(
                encode, rep_loss, state.params, batch, grad_cache_chunks
            )
        else:
            loss, grads = jax.value_and_grad(
                lambda lora: rep_loss(encode(lora, batch))
            )(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    return train_step
