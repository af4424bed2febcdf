"""Native C++ resize/normalize vs Pillow parity + threading."""

import time

import numpy as np
import pytest
from PIL import Image

from clip_embeds_tpu.image.preprocess import (
    native_resize_normalize,
    native_resize_normalize_batch,
    preprocess_pacl,
)
from clip_embeds_tpu.native.build import load_library


@pytest.fixture(scope="module")
def lib():
    lib = load_library()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_bicubic_matches_pillow(lib):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (123, 200, 3), dtype=np.uint8)

    pil = Image.fromarray(img).resize((64, 64), Image.BICUBIC)
    pil_arr = np.asarray(pil).astype(np.float32) / 255.0

    mean = (0.0, 0.0, 0.0)
    std = (1.0, 1.0, 1.0)
    ours = native_resize_normalize(img, 64, mean, std, bicubic=True)
    # Pillow quantizes the intermediate to uint8; allow 1/255 + rounding slack
    assert np.abs(ours - pil_arr).max() < 2.5 / 255


def test_bilinear_matches_pacl_path(lib):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (97, 150, 3), dtype=np.uint8)
    ref = preprocess_pacl(img, 48)  # PIL BILINEAR + ImageNet stats
    ours = native_resize_normalize(
        img, 48, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), bicubic=False
    )
    assert np.abs(ours - ref).max() < 0.03  # ~2.5/255 in normalized units


def test_batch_matches_single(lib):
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 255, (6, 80, 60, 3), dtype=np.uint8)
    mean = (0.5, 0.5, 0.5)
    std = (0.3, 0.3, 0.3)
    whole = native_resize_normalize_batch(batch, 32, mean, std, num_threads=4)
    for i in range(6):
        one = native_resize_normalize(batch[i], 32, mean, std)
        np.testing.assert_allclose(whole[i], one, rtol=1e-5, atol=1e-6)


def test_upscale(lib):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    pil = np.asarray(
        Image.fromarray(img).resize((48, 48), Image.BICUBIC)
    ).astype(np.float32) / 255.0
    ours = native_resize_normalize(img, 48, (0, 0, 0), (1, 1, 1))
    assert np.abs(ours - pil).max() < 2.5 / 255


def test_native_preprocess_clip_parity(lib):
    from clip_embeds_tpu.image.preprocess import (
        native_preprocess_clip,
        preprocess_clip,
    )

    rng = np.random.default_rng(5)
    for shape in [(123, 200, 3), (400, 250, 3), (112, 112, 3)]:
        img = rng.integers(0, 255, shape, dtype=np.uint8)
        a = native_preprocess_clip(img, 112)
        b = preprocess_clip(img, 112)
        assert a.shape == b.shape == (112, 112, 3)
        # within one uint8 step in normalized units (Pillow fixed-point coeffs)
        assert np.abs(a - b).max() < 1.5 / 255 / 0.2686
