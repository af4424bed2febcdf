"""Fused serving-path parity: ops/fused_block vs the composable blocks
(pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.core.factory import create_model
from clip_embeds_tpu.models.serving import (
    fused_encode_image,
    fused_path_available,
)


@pytest.mark.parametrize("quick", [False, True])
def test_fused_encode_image_parity(quick):
    model, params = create_model(
        "test-tiny", pretrained="openai" if quick else None, seed=3
    )
    assert model.cfg.quick_gelu is quick
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    want = model.apply(
        {"params": params}, images, normalize=True, method="encode_image"
    )
    got = fused_encode_image(
        model, params, images, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_path_available_shapes():
    model, _ = create_model("test-tiny")
    # tiny config: width 64 is not lane-aligned -> composable path
    assert not fused_path_available(model)

    from clip_embeds_tpu.core.config import get_model_config
    from clip_embeds_tpu.models.clip import CLIP

    flagship = CLIP(get_model_config("ViT-L-14-336", pretrained="openai"))
    assert fused_path_available(flagship)
    # ViT-H 1280 wide also fits
    vith = CLIP(get_model_config("ViT-H-14"))
    assert fused_path_available(vith)


@pytest.mark.slow
def test_fused_int8_parity_vs_static_quant_model():
    """int8 fused path == composable QuantDense-static path (same math)."""
    from clip_embeds_tpu.models.clip import CLIP
    from clip_embeds_tpu.models.serving import (
        fused_encode_image_int8,
        prepare_int8_tower,
    )

    model, params = create_model("test-tiny", seed=1)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    qtower = prepare_int8_tower(model, params, calib)

    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    got = fused_encode_image_int8(
        model, params, qtower, images, dtype=jnp.float32, interpret=True
    )
    # fp reference: close in cosine (int8 quantization noise only)
    want = model.apply(
        {"params": params}, images, normalize=True, method="encode_image"
    )
    cos = float((np.asarray(got) * np.asarray(want)).sum(-1).mean())
    assert cos > 0.99, cos
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=-1), 1.0, rtol=1e-5
    )


@pytest.mark.slow
def test_fused_encode_text_parity():
    from clip_embeds_tpu.models.serving import fused_encode_text

    model, params = create_model("test-tiny", seed=5)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(
        np.concatenate([
            np.full((3, 1), 300), rng.integers(1, 200, (3, 14)),
            np.full((3, 1), 400),  # EOT = argmax pooling target
        ], axis=1).astype(np.int32)
    )
    want = model.apply(
        {"params": params}, ids, normalize=True, method="encode_text"
    )
    got = fused_encode_text(
        model, params, ids, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_cls_fast_last_block_matches_full(quick=False):
    """CLS-only final block (pool 'tok' fast path) == running the full final
    fused block: nothing downstream reads the non-CLS rows."""
    model, params = create_model("test-tiny", seed=7)
    assert model.cfg.vision.pool_type == "tok"
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    full = fused_encode_image(
        model, params, images, dtype=jnp.float32, interpret=True,
        cls_fast_last=False,
    )
    fast = fused_encode_image(
        model, params, images, dtype=jnp.float32, interpret=True,
        cls_fast_last=True,
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(full), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_fused_text_int8_parity():
    """int8 causal text blocks stay close to the fp composable encode_text."""
    from clip_embeds_tpu.models.serving import (
        fused_encode_text_int8,
        prepare_int8_text_tower,
    )

    model, params = create_model("test-tiny", seed=9)
    rng = np.random.default_rng(4)
    def make_ids(b):
        return jnp.asarray(
            np.concatenate([
                np.full((b, 1), 300), rng.integers(1, 200, (b, 14)),
                np.full((b, 1), 400),
            ], axis=1).astype(np.int32))

    qtower = prepare_int8_text_tower(model, params, make_ids(4))
    ids = make_ids(3)
    got = fused_encode_text_int8(
        model, params, qtower, ids, dtype=jnp.float32, interpret=True
    )
    want = model.apply(
        {"params": params}, ids, normalize=True, method="encode_text"
    )
    cos = float((np.asarray(got) * np.asarray(want)).sum(-1).mean())
    assert cos > 0.99, cos
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=-1), 1.0, rtol=1e-5
    )


def test_fused_encode_image_siglip_parity():
    """SigLIP fused serving path (tanh-GELU blocks + MAP-head epilogue) ==
    the composable Siglip.encode_image."""
    from clip_embeds_tpu.models.serving import fused_encode_image_siglip
    from clip_embeds_tpu.models.siglip import (
        Siglip,
        SiglipConfig,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=64,
                                  layers=2, heads=4, intermediate_size=128),
        text=SiglipTextConfig(vocab_size=200, width=64, layers=2, heads=4,
                              intermediate_size=128,
                              max_position_embeddings=16),
    )
    model = Siglip(cfg)
    rng = np.random.default_rng(11)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 100, (2, 16)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), images, ids)["params"]

    want = model.apply({"params": params}, images, normalize=True,
                       method="encode_image")
    got = fused_encode_image_siglip(
        model, params, images, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_encode_image_siglip_int8_parity():
    """SigLIP W8A8 fused path (calibrated static scales) stays close to the
    fp composable encode_image."""
    from clip_embeds_tpu.models.serving import (
        fused_encode_image_siglip_int8,
        prepare_int8_siglip_tower,
    )
    from clip_embeds_tpu.models.siglip import (
        Siglip,
        SiglipConfig,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=64,
                                  layers=2, heads=4, intermediate_size=128),
        text=SiglipTextConfig(vocab_size=200, width=64, layers=2, heads=4,
                              intermediate_size=128,
                              max_position_embeddings=16),
    )
    model = Siglip(cfg)
    rng = np.random.default_rng(12)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    calib = jnp.asarray(
        rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 100, (2, 16)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), images, ids)["params"]

    qtower = prepare_int8_siglip_tower(model, params, calib)
    want = model.apply({"params": params}, images, normalize=True,
                       method="encode_image")
    got = fused_encode_image_siglip_int8(
        model, params, qtower, images, dtype=jnp.float32, interpret=True)
    cos = float((np.asarray(got) * np.asarray(want)).sum(-1).mean())
    assert cos > 0.99, cos
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=-1), 1.0, rtol=1e-5)


def _tiny_siglip():
    from clip_embeds_tpu.models.siglip import (
        Siglip,
        SiglipConfig,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=64,
                                  layers=2, heads=4, intermediate_size=128),
        text=SiglipTextConfig(vocab_size=200, width=64, layers=2, heads=4,
                              intermediate_size=128,
                              max_position_embeddings=16),
    )
    model = Siglip(cfg)
    rng = np.random.default_rng(13)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 100, (2, 16)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), images, ids)["params"]
    return model, params, images, ids, rng


def test_fused_encode_text_siglip_parity():
    """SigLIP fused text path (bidirectional, last-token pool -> head) ==
    the composable Siglip.encode_text."""
    from clip_embeds_tpu.models.serving import fused_encode_text_siglip

    model, params, _, ids, _ = _tiny_siglip()
    want = model.apply({"params": params}, ids, normalize=True,
                       method="encode_text")
    got = fused_encode_text_siglip(
        model, params, ids, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_encode_text_siglip_int8_parity():
    """SigLIP W8A8 fused text path stays close to the fp composable."""
    from clip_embeds_tpu.models.serving import (
        fused_encode_text_siglip_int8,
        prepare_int8_siglip_text_tower,
    )

    model, params, _, ids, rng = _tiny_siglip()
    calib = jnp.asarray(rng.integers(1, 100, (4, 16)).astype(np.int32))
    qtower = prepare_int8_siglip_text_tower(model, params, calib)
    want = model.apply({"params": params}, ids, normalize=True,
                       method="encode_text")
    got = fused_encode_text_siglip_int8(
        model, params, qtower, ids, dtype=jnp.float32, interpret=True)
    cos = float((np.asarray(got) * np.asarray(want)).sum(-1).mean())
    assert cos > 0.99, cos
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=-1), 1.0, rtol=1e-5)


def test_patchify_truncates_nondivisible_like_conv_valid():
    """384/14-style shapes: bottom/right remainder pixels drop (torch Conv2d
    valid padding), so so400m-patch14-384 yields 27x27 patches."""
    from clip_embeds_tpu.models.vit import patchify

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 62, 47, 3)).astype(np.float32)
    out = np.asarray(patchify(jnp.asarray(img), 14))
    assert out.shape == (1, (62 // 14) * (47 // 14), 14 * 14 * 3)
    ref = np.asarray(patchify(jnp.asarray(img[:, :56, :42]), 14))
    np.testing.assert_array_equal(out, ref)


def test_fused_encode_image_output_tokens_parity():
    """(pooled, tokens) from the fused path == composable
    encode_image(output_tokens=True) — the PACL/SPARC frozen-tower tap."""
    model, params = create_model("test-tiny", seed=5)
    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    want_pooled, want_tokens = model.apply(
        {"params": params}, images, normalize=True, output_tokens=True,
        method="encode_image",
    )
    got_pooled, got_tokens = fused_encode_image(
        model, params, images, dtype=jnp.float32, interpret=True,
        output_tokens=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_pooled), np.asarray(want_pooled), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_tokens), np.asarray(want_tokens), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_int8_output_tokens_parity_vs_static_quant():
    """int8 fused tokens == composable QuantDense-static tokens."""
    from clip_embeds_tpu.models.clip import CLIP
    from clip_embeds_tpu.models.serving import (
        fused_encode_image_int8,
        prepare_int8_tower,
    )

    model, params = create_model("test-tiny", seed=9)
    rng = np.random.default_rng(13)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    qtower = prepare_int8_tower(model, params, images)
    got_pooled, got_tokens = fused_encode_image_int8(
        model, params, qtower, images, dtype=jnp.float32, interpret=True,
        output_tokens=True,
    )
    # reference: composable path (fp) — int8 drift is bounded, tokens close
    want_pooled, want_tokens = model.apply(
        {"params": params}, images, normalize=True, output_tokens=True,
        method="encode_image",
    )
    gp = np.asarray(got_pooled, np.float32).reshape(-1)
    wp = np.asarray(want_pooled, np.float32).reshape(-1)
    cos = float(gp @ wp / (np.linalg.norm(gp) * np.linalg.norm(wp)))
    assert cos > 0.999, cos
    gt = np.asarray(got_tokens, np.float32).reshape(-1)
    wt = np.asarray(want_tokens, np.float32).reshape(-1)
    cos_t = float(gt @ wt / (np.linalg.norm(gt) * np.linalg.norm(wt)))
    assert cos_t > 0.99, cos_t
