"""bench.py VQA leg smoke test (tiny-config hook).

Runs the LLaVA VQAScore bench leg end-to-end on the tiny config
(BENCH_VQA_TINY): on-device param synthesis, KV-reuse vs pair-path timing,
device-side trunk quantization. Pins the leg's structure so the real-chip
run can't break silently; the KV-reuse speedup must exceed 1 even at toy
shapes (it is ~n x on the prefix FLOPs at the 7B shape)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow


def test_bench_vqa_tiny(monkeypatch):
    monkeypatch.setenv("BENCH_VQA_TINY", "1")
    import jax
    import jax.numpy as jnp

    import bench

    out = bench._bench_vqa(jax, jnp, np)
    assert out["vqa_bf16_fits"] is True
    for key in (
        "vqa_bf16_scores_per_s", "vqa_bf16_prefill_tokens_per_s",
        "vqa_bf16_pair_scores_per_s", "vqa_kv_reuse_speedup",
        "vqa_int8_scores_per_s", "vqa_int8_prefill_tokens_per_s",
        "vqa_int8_kv_reuse_speedup", "vqa_int8_max_abs_score_diff",
        "vqa_int8_group8_scores_per_s", "vqa_int8_group8_vs_per_image",
    ):
        assert key in out, key
        assert np.isfinite(out[key])
    assert "vqa_int8_group8" not in out  # structured skip absent == leg ran
    assert "vqa_int8_group8_wall_speedup" in out
    # at toy shapes the prefix compute is negligible and dispatch noise
    # dominates, so only sanity-bound the ratio here; the >1 claim is made
    # (and recorded) at the real 7B shape on the chip
    assert out["vqa_kv_reuse_speedup"] > 0.5
    assert out["vqa_int8_max_abs_score_diff"] < 0.2


def test_bench_t5_tiny(monkeypatch):
    """CLIP-FlanT5 bench leg on the tiny config: feature-reuse vs pair-path
    timing + on-device T5 trunk quantization + exactness pins."""
    monkeypatch.setenv("BENCH_VQA_TINY", "1")
    import jax
    import jax.numpy as jnp

    import bench

    out = bench._bench_t5(jax, jnp, np)
    for key in (
        "t5_xl_bf16_scores_per_s", "t5_xl_bf16_pair_scores_per_s",
        "t5_xl_bf16_feats_reuse_speedup", "t5_xl_feats_vs_pair_max_diff",
        "t5_xl_int8_scores_per_s", "t5_xl_int8_pair_scores_per_s",
        "t5_xl_int8_max_abs_score_diff",
    ):
        assert key in out, (key, out)
        assert np.isfinite(out[key])
    # the feature-reuse path is the same math as the pair path
    assert out["t5_xl_feats_vs_pair_max_diff"] < 1e-3
    assert out["t5_xl_int8_max_abs_score_diff"] < 0.2
    # xxl-bf16 never runs single-chip: a structured skip, not a traceback
    assert isinstance(out["t5_xxl_bf16"], dict)
    assert "skipped" in out["t5_xxl_bf16"]


def test_bench_vlm2vec_tiny(monkeypatch):
    """VLM2Vec bench leg: embed_last_token serving (bf16 + int8) and the
    LoRA + grad-cache train step produce finite numbers at tiny shapes."""
    monkeypatch.setenv("BENCH_VQA_TINY", "1")
    import jax
    import jax.numpy as jnp

    import bench

    out = bench._bench_vlm2vec(jax, jnp, np)
    for key in ("vlm2vec_bf16_embed_per_s", "vlm2vec_int8_embed_per_s",
                "vlm2vec_train_samples_per_s"):
        assert key in out, (key, out)
        assert np.isfinite(out[key])


def test_bench_qwen2vl_tiny(monkeypatch):
    """Qwen2-VL bench leg: pre-quantized build + embed timing; the bf16
    impossibility is a structured skip."""
    monkeypatch.setenv("BENCH_VQA_TINY", "1")
    import jax
    import jax.numpy as jnp

    import bench

    out = bench._bench_qwen2vl(jax, jnp, np)
    assert "qwen2vl_int8_embed_per_s" in out, out
    assert np.isfinite(out["qwen2vl_int8_embed_per_s"])
    assert "skipped" in out["qwen2vl_bf16"]


def test_short_err_sanitizes():
    import bench

    e = ValueError("boom\n\x1b[2mtrace\x1b[0m  line2 " + "x" * 300)
    s = bench._short_err(e)
    assert "\n" not in s and "\x1b" not in s and len(s) <= 160
    assert s.startswith("ValueError: boom")
