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


def test_clip_t5_checkpoint_conversion(tmp_path):
    """convert_clip_t5_state_dict on the reference CLIPT5 checkpoint layout
    (clip_t5.py:44-54: T5 keys + vision_tower.vision_tower.* +
    mm_projector.{0,2}); image-feature path checked against the torch side."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    torch.manual_seed(0)
    vis = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        hidden_act="quick_gelu", attn_implementation="eager",
    )).eval()
    t5 = HFT5(HFT5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
    )).eval()
    projector = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.GELU(), torch.nn.Linear(64, 64)
    ).eval()

    sd = {}
    sd.update({f"vision_tower.vision_tower.{k}": v
               for k, v in vis.state_dict().items()})
    sd.update({f"mm_projector.{k}": v for k, v in projector.state_dict().items()})
    sd.update(t5.state_dict())
    # HF T5 state dicts omit shared for tied embeds sometimes; ensure present
    sd.setdefault("shared.weight", t5.shared.weight)

    from clip_embeds_tpu.core.torch_convert import convert_clip_t5_state_dict

    params = convert_clip_t5_state_dict(sd)
    assert set(params) == {"vision_tower", "multi_modal_projector", "t5"}

    cfg = CLIPT5Config(
        t5=T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_heads=4),
        vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                            head_width=32),
    )
    model = CLIPT5(cfg, attn_impl="reference")

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = model.apply({"params": params}, jnp.asarray(images),
                      method="encode_images")

    with torch.no_grad():
        hs = vis(torch.tensor(images).permute(0, 3, 1, 2),
                 output_hidden_states=True).hidden_states[-2]
        ref = projector(hs[:, 1:])  # feature_select 'patch'
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=3e-4, atol=3e-4)
