"""Zero-shot classification: prompt-ensemble classifier + top-k eval.

Reference: open_clip/src/open_clip/zero_shot_classifier.py:21-110
(build_zero_shot_classifier: per class, tokenize template expansions, encode,
mean-pool normalized embeddings, renormalize) and
open_clip_train/zero_shot.py:42-87 (top-1/5 accuracy loop).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence, Union

import numpy as np

# A compact prompt ensemble (callers pass the full 80-template OpenAI list for
# exact ImageNet parity; templates are data supplied by the experiment).
SIMPLE_TEMPLATES: Sequence[Callable[[str], str]] = (
    lambda c: f"a photo of a {c}.",
    lambda c: f"a bad photo of a {c}.",
    lambda c: f"a photo of many {c}.",
    lambda c: f"a photo of the large {c}.",
    lambda c: f"a photo of the small {c}.",
    lambda c: f"art of the {c}.",
    lambda c: f"a photo of a {c}, a type of object.",
)

Template = Union[str, Callable[[str], str]]


def _apply(template: Template, classname: str) -> str:
    if callable(template):
        return template(classname)
    return template.format(c=classname)


def build_zero_shot_classifier(
    encode_texts: Callable[[Sequence[str]], np.ndarray],
    classnames: Sequence[str],
    templates: Sequence[Template] = SIMPLE_TEMPLATES,
    num_classes_per_batch: Optional[int] = 10,
) -> np.ndarray:
    """[embed_dim, n_classes] classifier matrix of prompt-ensembled embeddings.

    encode_texts must return L2-normalized embeddings (the factory scorers'
    encode_texts does).
    """
    num_templates = len(templates)
    columns = []
    batch = num_classes_per_batch or len(classnames)
    for start in range(0, len(classnames), batch):
        chunk = classnames[start : start + batch]
        prompts = [_apply(t, c) for c in chunk for t in templates]
        embeds = encode_texts(prompts)
        embeds = embeds.reshape(len(chunk), num_templates, -1).mean(axis=1)
        embeds = embeds / np.linalg.norm(embeds, axis=-1, keepdims=True)
        columns.append(embeds)
    return np.concatenate(columns, axis=0).T


def zero_shot_eval(
    encode_images: Callable[[Sequence], np.ndarray],
    classifier: np.ndarray,
    samples: Iterable,
    targets: Sequence[int],
    batch_size: int = 64,
    logit_scale: float = 100.0,
) -> Dict[str, float]:
    """Top-1/top-5 accuracy over (image, class-index) pairs."""
    from .metrics import zero_shot_accuracy

    samples = list(samples)
    logits = []
    for start in range(0, len(samples), batch_size):
        feats = encode_images(samples[start : start + batch_size])
        logits.append(logit_scale * feats @ classifier)
    return zero_shot_accuracy(
        np.concatenate(logits), np.asarray(targets), topk=(1, 5)
    )


def load_imagenet_metadata() -> Dict[str, Sequence[str]]:
    """The 1000 ImageNet classnames + OpenAI's 80 prompt templates
    (reference zero_shot_metadata.py, shipped as data; templates are
    '{c}'-style format strings accepted by build_zero_shot_classifier)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "zero_shot_metadata.json")
    with open(path) as fh:
        return json.load(fh)
