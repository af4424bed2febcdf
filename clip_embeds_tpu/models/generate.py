"""Greedy autoregressive generation with a KV cache.

TPU-native replacement for the reference's generation paths (CoCa.generate,
coca_model.py:286+; t2v VQA models' .generate): prefill the cache with the
prompt in one forward, then a `lax.while_loop` of single-token steps — static
shapes throughout, cache carried as a pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def init_cache(model, batch_size: int) -> Any:
    """Zero KV cache pytree for a model (eval_shape only — flax init would
    execute a step and advance the cache index)."""
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((batch_size, 1, model.cfg.hidden_size)), None, None,
            True, method="trunk",
        )["cache"]
    )
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def greedy_generate(
    model,                      # LlamaForCausalLM-compatible
    params: Any,
    input_ids: jax.Array,       # [B, L] prompt (right-aligned, no padding)
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
    inputs_embeds: Optional[jax.Array] = None,
) -> jax.Array:
    """Greedy decode -> [B, max_new_tokens] (padded with eos after stop)."""
    b, prompt_len = input_ids.shape

    def apply(variables, ids=None, embeds=None, positions=None):
        if embeds is None:
            embeds = model.apply(variables, ids, method="embed")
        hidden, updated = model.apply(
            variables, embeds, None, positions, True,
            method="trunk", mutable=["cache"],
        )
        logits = model.apply(variables, hidden[:, -1:], method="logits")
        return logits[:, 0], updated["cache"]

    # prefill: run the whole prompt through the cache
    variables = {"params": params}
    cache = init_cache(model, b)
    prefill_embeds = (
        inputs_embeds
        if inputs_embeds is not None
        else model.apply(variables, input_ids, method="embed")
    )
    n_prefill = prefill_embeds.shape[1]
    positions = jnp.broadcast_to(
        jnp.arange(n_prefill)[None], (b, n_prefill)
    )
    logits, cache = apply(
        {"params": params, "cache": cache},
        embeds=prefill_embeds, positions=positions,
    )
    next_token = jnp.argmax(logits, axis=-1)

    def cond(state):
        step, _, _, done, _ = state
        return jnp.logical_and(step < max_new_tokens - 1, ~jnp.all(done))

    def body(state):
        step, token, cache, done, out = state
        pos = jnp.full((b, 1), n_prefill + step + 1, jnp.int32)
        logits, cache = apply(
            {"params": params, "cache": cache},
            ids=token[:, None], positions=pos,
        )
        nxt = jnp.argmax(logits, axis=-1)
        if eos_token_id is not None:
            done = jnp.logical_or(done, token == eos_token_id)
            nxt = jnp.where(done, eos_token_id, nxt)
        out = out.at[:, step + 1].set(nxt)
        return step + 1, nxt, cache, done, out

    out = jnp.full((b, max_new_tokens), eos_token_id or 0, jnp.int32)
    out = out.at[:, 0].set(next_token)
    done = jnp.zeros((b,), bool)
    if eos_token_id is not None:
        done = next_token == eos_token_id
    _, _, _, _, out = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), next_token, cache, done, out)
    )
    return out


def llava_greedy_generate(
    llava_model,               # models.llava.Llava
    params: Any,
    input_ids: jax.Array,      # [B, L] prompt with one IMAGE_TOKEN_INDEX
    pixel_values: jax.Array,   # [B, S, S, 3]
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
) -> jax.Array:
    """Greedy caption/answer generation for LLaVA (t2v llava generate path):
    splice image features into the prompt embeddings, then decode through the
    language model's KV cache."""
    image_features = llava_model.apply(
        {"params": params}, pixel_values, method="encode_images"
    )
    embeds = llava_model.apply(
        {"params": params}, input_ids, image_features, method="merge"
    )
    from .llama import LlamaForCausalLM

    lm = LlamaForCausalLM(
        llava_model.cfg.llama, dtype=llava_model.dtype,
        attn_impl=llava_model.attn_impl,
    )
    return greedy_generate(
        lm, params["language_model"], input_ids=jnp.zeros(
            (embeds.shape[0], 0), jnp.int32
        ),
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        inputs_embeds=embeds,
    )
