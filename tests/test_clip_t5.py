"""CLIP-T5 model + T5 VQAScore pipeline tests."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from clip_embeds_tpu.core.config import VisionConfig
from clip_embeds_tpu.models.clip_t5 import CLIPT5, CLIPT5Config
from clip_embeds_tpu.models.llava import IMAGE_TOKEN_INDEX
from clip_embeds_tpu.models.t5 import T5Config
from clip_embeds_tpu.scores.vqa_score import T5VQAScorer, t5_tokenizer_image_token

pytestmark = pytest.mark.slow  # torch-oracle parity family (see pyproject)


def tiny():
    cfg = CLIPT5Config(
        t5=T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_heads=4),
        vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                            head_width=32),
    )
    model = CLIPT5(cfg, attn_impl="reference")
    ids = jnp.asarray([[1, 2, IMAGE_TOKEN_INDEX, 3]], jnp.int32)
    pixels = jnp.zeros((1, 32, 32, 3))
    labels = jnp.asarray([[7, 8, 1]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, pixels, labels)["params"]
    return model, params


def test_clip_t5_shapes():
    model, params = tiny()
    ids = jnp.asarray([[1, 2, IMAGE_TOKEN_INDEX, 3, 4]], jnp.int32)
    pixels = jnp.zeros((1, 32, 32, 3))
    labels = jnp.asarray([[7, 8, 1, -100]], jnp.int32)
    logits = model.apply({"params": params}, ids, pixels, labels)
    assert logits.shape == (1, 4, 256)


def test_t5_tokenizer_image_token():
    tok = lambda t: [5] * len(t.split())
    ids = t5_tokenizer_image_token("hello <image> world", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1


def test_t5_vqa_scorer():
    model, params = tiny()
    tok = lambda t: [2 + (sum(map(ord, w)) % 200) for w in t.split()] + [1]
    scorer = T5VQAScorer(model, params, tok, batch_size=2, pad_to_multiple=8)
    rng = np.random.default_rng(0)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (30, 40, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    scores = scorer.forward(imgs, ["a cat", "a dog", "a bird"])
    assert scores.shape == (3,)
    assert np.all(scores > 0) and np.all(scores <= 1)
