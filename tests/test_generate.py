"""KV-cache greedy generation vs HF greedy generate (tiny Llama)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.core.torch_convert import convert_llama_state_dict
from clip_embeds_tpu.models.generate import greedy_generate
from clip_embeds_tpu.models.llama import LlamaConfig, LlamaForCausalLM


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, max_position_embeddings=64,
    )
    model = LlamaForCausalLM(cfg, attn_impl="reference")
    params = convert_llama_state_dict(hf.state_dict())
    return hf, model, params


def test_cached_forward_matches_full(pair):
    """Decode-mode chunked forward == full forward (cache correctness)."""
    _, model, params = pair
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, 10)), jnp.int32)

    full = model.apply({"params": params}, ids)

    # chunked: prefill 6 tokens, then 4 single steps
    from clip_embeds_tpu.models.generate import init_cache

    cache = init_cache(model, 2)
    embeds = model.apply({"params": params}, ids[:, :6], method="embed")
    pos = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    h, upd = model.apply(
        {"params": params, "cache": cache}, embeds, None, pos, True,
        method="trunk", mutable=["cache"],
    )
    outs = [model.apply({"params": params}, h, method="logits")]
    cache = upd["cache"]
    for t in range(6, 10):
        e = model.apply({"params": params}, ids[:, t : t + 1], method="embed")
        pos = jnp.full((2, 1), t, jnp.int32)
        h, upd = model.apply(
            {"params": params, "cache": cache}, e, None, pos, True,
            method="trunk", mutable=["cache"],
        )
        cache = upd["cache"]
        outs.append(model.apply({"params": params}, h, method="logits"))
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_greedy_matches_hf(pair):
    import torch

    hf, model, params = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (2, 7))

    with torch.no_grad():
        hf_out = hf.generate(
            torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
            use_cache=True, pad_token_id=0,
        )[:, 7:].numpy()

    ours = np.asarray(greedy_generate(
        model, params, jnp.asarray(ids, jnp.int32), max_new_tokens=8
    ))
    np.testing.assert_array_equal(ours, hf_out)


def test_llava_greedy_generate():
    from clip_embeds_tpu.core.config import VisionConfig
    from clip_embeds_tpu.models.generate import llava_greedy_generate
    from clip_embeds_tpu.models.llava import Llava, LlavaConfig

    cfg = LlavaConfig(
        llama=LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, max_position_embeddings=64,
        ),
        vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                            head_width=32),
    )
    model = Llava(cfg, attn_impl="reference")
    ids = jnp.asarray([[1, 5, -200, 7, 8]], jnp.int32)
    pixels = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), ids, pixels)["params"]
    out = llava_greedy_generate(
        model, params, ids, pixels, max_new_tokens=6, eos_token_id=2
    )
    assert out.shape == (1, 6)
    assert np.asarray(out).min() >= 0

    # determinism and image dependence
    out2 = llava_greedy_generate(
        model, params, ids, pixels, max_new_tokens=6, eos_token_id=2
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = llava_greedy_generate(
        model, params, ids, pixels + 1.0, max_new_tokens=6, eos_token_id=2
    )
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
