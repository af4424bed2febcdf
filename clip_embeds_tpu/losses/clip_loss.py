"""Contrastive losses: InfoNCE (+NegCLIP hard-text), PACL, VLM2Vec embedding.

Pure functions over *global* feature batches. Under pjit over a data-sharded
mesh the logit matmuls are computed distributed and XLA inserts the all-gathers
that the reference does by hand (open_clip/src/open_clip/loss.py:21-87
gather_features / gather_features_diffsize); gradients flow through gathers
natively (the reference's --gather-with-grad is the JAX default).

Hard-text semantics (fork additions, loss.py:89-193): the text batch carries H
extra hard-negative captions appended after the B originals; images score
against all B+H texts while only the B original texts score back against
images (labels -100 for negatives -> masked out of the CE mean).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-row CE against integer labels. logits [N, C] fp32, labels [N] int."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - picked


def clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    logit_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Symmetric InfoNCE over the global batch (reference ClipLoss.forward)."""
    logits_img = logit_scale * jnp.einsum(
        "id,jd->ij", image_features, text_features,
        preferred_element_type=jnp.float32,
    )
    if logit_bias is not None:
        logits_img = logits_img + logit_bias
    labels = jnp.arange(image_features.shape[0])
    loss_i = softmax_cross_entropy(logits_img, labels).mean()
    loss_t = softmax_cross_entropy(logits_img.T, labels).mean()
    return (loss_i + loss_t) / 2


def clip_loss_hard_text(
    image_features: jax.Array,       # [B, D]
    text_features: jax.Array,        # [B, D] originals
    hard_text_features: jax.Array,   # [H, D] hard negatives (may be padded)
    logit_scale: jax.Array,
    hard_valid: Optional[jax.Array] = None,  # bool [H]; False = padding row
) -> jax.Array:
    """NegCLIP-style loss with appended hard negative captions.

    Matches the reference mixed ground truth (loss.py:127-135 + F.cross_entropy
    ignore_index=-100): image rows see B+H text columns with target i; text
    rows beyond B contribute nothing. The variable-size cross-rank gather
    (gather_features_diffsize, loss.py:67-87) is replaced by a static H with a
    validity mask — the XLA-friendly redesign from SURVEY.md §2e.
    """
    b = image_features.shape[0]
    all_text = jnp.concatenate([text_features, hard_text_features], axis=0)
    logits_img = logit_scale * jnp.einsum(
        "id,jd->ij", image_features, all_text,
        preferred_element_type=jnp.float32,
    )  # [B, B+H]
    if hard_valid is not None:
        col_mask = jnp.concatenate(
            [jnp.ones((b,), bool), hard_valid.astype(bool)], axis=0
        )
        logits_img = jnp.where(col_mask[None, :], logits_img, -jnp.inf)
    labels = jnp.arange(b)
    loss_i = softmax_cross_entropy(logits_img, labels).mean()
    # text->image: only original texts have a positive image
    logits_txt = logit_scale * jnp.einsum(
        "td,jd->tj", text_features, image_features,
        preferred_element_type=jnp.float32,
    )  # [B, B]
    loss_t = softmax_cross_entropy(logits_txt, labels).mean()
    return (loss_i + loss_t) / 2


def _kd_cross_entropy(teacher_logits: jax.Array,
                      student_logits: jax.Array) -> jax.Array:
    """-(softmax(teacher) * log_softmax(student)).sum(1).mean(0)
    (reference DistillClipLoss.dist_loss, loss.py:243-244)."""
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
    ls = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=1)
    return -(t * ls).sum(axis=1).mean(axis=0)


def distill_clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    dist_image_features: jax.Array,
    dist_text_features: jax.Array,
    dist_logit_scale: jax.Array,
):
    """(contrastive_loss, distill_loss) for --distill training.

    Reference: open_clip/src/open_clip/loss.py:241-277 DistillClipLoss —
    standard symmetric InfoNCE on the student plus KD cross-entropy between
    the frozen teacher's logits and the student's, both directions, halved.
    Teacher features come from a no-grad forward (train.py:103-107); callers
    wrap the teacher in jax.lax.stop_gradient or keep its params out of grad.
    """
    logits_img = logit_scale * jnp.einsum(
        "id,jd->ij", image_features, text_features,
        preferred_element_type=jnp.float32,
    )
    logits_txt = logits_img.T
    t_logits_img = dist_logit_scale * jnp.einsum(
        "id,jd->ij", dist_image_features, dist_text_features,
        preferred_element_type=jnp.float32,
    )
    t_logits_txt = t_logits_img.T
    labels = jnp.arange(image_features.shape[0])
    contrastive = (
        softmax_cross_entropy(logits_img, labels).mean()
        + softmax_cross_entropy(logits_txt, labels).mean()
    ) / 2
    distill = (
        _kd_cross_entropy(t_logits_img, logits_img)
        + _kd_cross_entropy(t_logits_txt, logits_txt)
    ) / 2
    return contrastive, distill


def pacl_clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """PACL trainer's in-batch InfoNCE with fixed temperature.

    Reference: Patch-Aligned-Contrastive-Learning/model/pacl.py:489-514
    (logit_scale = 1/temperature, no learned scale).
    """
    return clip_loss(image_features, text_features, jnp.asarray(1.0 / temperature))


def embedding_contrastive_loss(
    query_reps: jax.Array,
    target_reps: jax.Array,
    temperature: float = 0.02,
) -> jax.Array:
    """VLM2Vec-style one-directional contrastive loss over gathered reps.

    Reference: VLM2Vec/src/loss.py:7-42 (Simple/DistributedContrastiveLoss):
    CE(query @ target.T / T) with diagonal targets. Under pjit the global
    matmul *is* the distributed gather.
    """
    logits = jnp.einsum(
        "qd,td->qt", query_reps, target_reps,
        preferred_element_type=jnp.float32,
    ) / temperature
    labels = jnp.arange(query_reps.shape[0])
    return softmax_cross_entropy(logits, labels).mean()


def clip_metrics(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
) -> Dict[str, jax.Array]:
    """In-batch accuracy diagnostics (reference train.py logs these)."""
    logits = logit_scale * image_features @ text_features.T
    labels = jnp.arange(logits.shape[0])
    return {
        "i2t_acc": (logits.argmax(-1) == labels).mean(),
        "t2i_acc": (logits.argmax(0) == labels).mean(),
    }
