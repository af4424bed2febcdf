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
