"""Round-4: grouped m x n VQAScore — batched k-image prefill + block-causal
concatenated suffixes vs the per-image KV-reuse path.

The per-image path (scores/vqa_score.py forward_image_texts) pays TWO device
dispatches per image: a batch-1 prefill and a batch-n suffix pass.
forward_groups batches k distinct images into ONE prefill (per-row sentinel
positions / prefix lengths) and scores all k x n candidates in ONE suffix
pass whose rows hold the n suffixes concatenated, attending block-diagonally
over their row's prefix KV (models/llava.py suffix_logits suffix_block=ls —
no KV replication). Under a high-latency link (the axon tunnel, or any
disaggregated serving frontend) dispatch count is the tail that batching is
supposed to cut: 2 dispatches per k-group instead of 2k.

Measures, at llava-v1.5-7b shapes (W8A8 dynamic trunk, scan layout for fast
compile — both paths share it, so the comparison is layout-fair):
  (a) device-only time via fori differencing for both composites,
  (b) user-visible wall time per k-group: k sequential dispatch-pairs with
      per-image host fetches vs one grouped dispatch + one fetch,
  (c) exactness: grouped scores == per-image scores.

Run: python perf/experiments/exp_vqagroup.py [k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from clip_embeds_tpu.core.compile_cache import enable_persistent_cache
from clip_embeds_tpu.models.llava import (
    IMAGE_TOKEN_INDEX,
    Llava,
    LlavaConfig,
    extract_prefix_kv,
)
from clip_embeds_tpu.scores.vqa_score import _exp_neg_mean_ce

enable_persistent_cache()

CFG = LlavaConfig()
N_TEXTS, LP_PAD, LS = 8, 64, 16
PREFIX_LEN, SENTINEL = 48, 36
N_LAYERS = CFG.llama.num_layers
N_IMAGE = CFG.n_image_tokens


def inputs(k: int):
    """k images' worth of the bench.py vqa-leg shapes: identical prefix
    token layout per row (real evals share the question template), distinct
    pixels and suffixes per image."""
    rng = np.random.default_rng(3)
    prefix_ids = np.zeros((k, LP_PAD), np.int32)
    prefix_ids[:, :PREFIX_LEN] = rng.integers(2, 31000, (k, PREFIX_LEN))
    prefix_ids[:, 0] = 1
    prefix_ids[:, SENTINEL] = IMAGE_TOKEN_INDEX
    prefix_valid = np.zeros((k, LP_PAD), bool)
    prefix_valid[:, :PREFIX_LEN] = True
    suffix_ids = rng.integers(2, 31000, (k, N_TEXTS, LS)).astype(np.int32)
    suffix_mask = np.ones((k, N_TEXTS, LS), bool)
    suffix_mask[:, :, -2:] = False
    labels = np.full((k, N_TEXTS, LS), -100, np.int32)
    labels[:, :, 10:14] = suffix_ids[:, :, 10:14]
    pixels = rng.standard_normal((k, 336, 336, 3)).astype(np.float32)
    return {
        "prefix_ids": jnp.asarray(prefix_ids),
        "prefix_valid": jnp.asarray(prefix_valid),
        "suffix_ids": jnp.asarray(suffix_ids),
        "suffix_mask": jnp.asarray(suffix_mask),
        "labels": jnp.asarray(labels),
        "pixels": jnp.asarray(pixels, jnp.bfloat16),
        "real_f": jnp.asarray(
            np.full((k,), PREFIX_LEN - 1 + N_IMAGE, np.int32)),
    }


def build_int8_params(dev):
    bf16_model = Llava(CFG, dtype=jnp.bfloat16, scan_llm=True)
    shapes = jax.eval_shape(
        lambda key: bf16_model.init(
            key, dev["prefix_ids"][:1],
            jnp.zeros((1, 336, 336, 3), jnp.bfloat16))["params"],
        jax.random.PRNGKey(0),
    )
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, len(leaves))
        return [
            jax.random.normal(kk, l.shape, jnp.bfloat16) * 0.02
            if len(l.shape) >= 2 else jnp.ones(l.shape, jnp.bfloat16)
            for kk, l in zip(ks, leaves)
        ]

    params = jax.tree.unflatten(treedef, mk(jax.random.PRNGKey(1)))
    from clip_embeds_tpu.models.quant import (
        LLAMA_QUANT_LAYER_NAMES,
        quantize_tree_on_device,
    )

    lm = dict(params["language_model"])
    lm["model"] = quantize_tree_on_device(
        lm["model"], LLAMA_QUANT_LAYER_NAMES, free_source=True)
    return dict(params, language_model=lm)


def make_composites(model, dev, k):
    """(per_image_once, grouped_once, per_image_loop, grouped_loop)."""

    def per_image_raw(p, prefix_ids, pixels, prefix_valid, suffix_ids,
                      suffix_mask, labels, real_f):
        pmask, mut = model.apply(
            {"params": p}, prefix_ids, pixels, prefix_valid,
            method="prefill", mutable=["kv"],
        )
        kv = extract_prefix_kv(mut["kv"], N_LAYERS)
        logits = model.apply(
            {"params": p}, suffix_ids, kv, pmask, suffix_mask, real_f,
            method="suffix_logits",
        )
        return _exp_neg_mean_ce(
            logits[:, :-1].astype(jnp.float32), labels[:, 1:])

    def grouped_raw(p, prefix_ids, pixels, prefix_valid, suffix_ids,
                    suffix_mask, labels, real_f):
        pmask, mut = model.apply(
            {"params": p}, prefix_ids, pixels, prefix_valid,
            method="prefill", mutable=["kv"],
        )
        kv = extract_prefix_kv(mut["kv"], N_LAYERS)
        flat_ids = suffix_ids.reshape(k, N_TEXTS * LS)
        flat_mask = suffix_mask.reshape(k, N_TEXTS * LS)
        logits = model.apply(
            {"params": p}, flat_ids, kv, pmask, flat_mask, real_f,
            method="suffix_logits", suffix_block=LS,
        )
        vocab = logits.shape[-1]
        blocks = logits.reshape(k * N_TEXTS, LS, vocab)
        lab = labels.reshape(k * N_TEXTS, LS)
        scores = _exp_neg_mean_ce(
            blocks[:, :-1].astype(jnp.float32), lab[:, 1:])
        return scores.reshape(k, N_TEXTS)

    per_image_once = jax.jit(per_image_raw)
    grouped_once = jax.jit(grouped_raw)

    def body_per_image(p, salt):
        def one(i, acc):
            s = per_image_raw(
                p,
                jax.lax.dynamic_slice_in_dim(dev["prefix_ids"], i, 1),
                jax.lax.dynamic_slice_in_dim(dev["pixels"], i, 1)
                + salt.astype(jnp.bfloat16),
                jax.lax.dynamic_slice_in_dim(dev["prefix_valid"], i, 1),
                jax.lax.dynamic_slice_in_dim(dev["suffix_ids"], i, 1)[0],
                jax.lax.dynamic_slice_in_dim(dev["suffix_mask"], i, 1)[0],
                jax.lax.dynamic_slice_in_dim(dev["labels"], i, 1)[0],
                dev["real_f"][0],
            )
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, k, one, jnp.asarray(0.0)) * 1e-6

    def body_grouped(p, salt):
        s = grouped_raw(
            p, dev["prefix_ids"], dev["pixels"] + salt.astype(jnp.bfloat16),
            dev["prefix_valid"], dev["suffix_ids"], dev["suffix_mask"],
            dev["labels"], dev["real_f"],
        )
        return jnp.sum(s) * 1e-6

    def as_loop(body):
        @jax.jit
        def loop(p, salt0, iters):
            return jax.lax.fori_loop(
                0, iters, lambda _, salt: body(p, salt), salt0)
        return loop

    return (per_image_once, grouped_once,
            as_loop(body_per_image), as_loop(body_grouped))


def timed_loop(loop, p, iters=4):
    float(loop(p, jnp.asarray(1e-6), 1))
    float(loop(p, jnp.asarray(1e-6), iters))
    t0 = time.perf_counter(); float(loop(p, jnp.asarray(1e-6), 1))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(p, jnp.asarray(1e-6), iters))
    tl = time.perf_counter() - t0
    return max(tl - ts, 0.1 * tl) / (iters - 1)


def main(k: int):
    dev = inputs(k)
    print(f"building + quantizing 7B scan trunk (k={k}, n={N_TEXTS})",
          flush=True)
    params = build_int8_params(dev)
    model = Llava(CFG, dtype=jnp.bfloat16, scan_llm=True,
                  quant_llm="dynamic")
    per_image_once, grouped_once, per_image_loop, grouped_loop = \
        make_composites(model, dev, k)

    # exactness: grouped == per-image, at the full 7B shape
    per = np.stack([
        np.asarray(per_image_once(
            params, dev["prefix_ids"][i:i + 1], dev["pixels"][i:i + 1],
            dev["prefix_valid"][i:i + 1], dev["suffix_ids"][i],
            dev["suffix_mask"][i], dev["labels"][i], dev["real_f"][0],
        ), np.float32)
        for i in range(k)
    ])
    grp = np.asarray(grouped_once(
        params, dev["prefix_ids"], dev["pixels"], dev["prefix_valid"],
        dev["suffix_ids"], dev["suffix_mask"], dev["labels"], dev["real_f"],
    ), np.float32)
    dmax = float(np.abs(per - grp).max())
    print(f"exactness: max|grouped - per_image| = {dmax:.2e}", flush=True)

    # (a) device-only via fori differencing
    t_per = timed_loop(per_image_loop, params)
    t_grp = timed_loop(grouped_loop, params)
    print(f"device-only, per k={k} group: per-image {t_per * 1e3:8.1f} ms "
          f"({k * N_TEXTS / t_per:7.1f} scores/s) | grouped "
          f"{t_grp * 1e3:8.1f} ms ({k * N_TEXTS / t_grp:7.1f} scores/s) | "
          f"ratio {t_per / t_grp:.2f}x", flush=True)

    # (b) user-visible wall time: sequential per-image dispatch-pairs with a
    # host fetch per image (the forward_image_texts serving pattern) vs ONE
    # grouped dispatch + one fetch. Includes tunnel dispatch latency — the
    # cost forward_groups exists to amortize.
    def wall_per_image():
        t0 = time.perf_counter()
        for i in range(k):
            np.asarray(per_image_once(
                params, dev["prefix_ids"][i:i + 1], dev["pixels"][i:i + 1],
                dev["prefix_valid"][i:i + 1], dev["suffix_ids"][i],
                dev["suffix_mask"][i], dev["labels"][i], dev["real_f"][0],
            ))
        return time.perf_counter() - t0

    def wall_grouped():
        t0 = time.perf_counter()
        np.asarray(grouped_once(
            params, dev["prefix_ids"], dev["pixels"], dev["prefix_valid"],
            dev["suffix_ids"], dev["suffix_mask"], dev["labels"],
            dev["real_f"],
        ))
        return time.perf_counter() - t0

    wall_per_image(); wall_grouped()  # warm
    wp = min(wall_per_image() for _ in range(3))
    wg = min(wall_grouped() for _ in range(3))
    print(f"wall (dispatch-inclusive), per k={k} group: per-image "
          f"{wp * 1e3:8.1f} ms ({k * N_TEXTS / wp:7.1f} scores/s) | grouped "
          f"{wg * 1e3:8.1f} ms ({k * N_TEXTS / wg:7.1f} scores/s) | "
          f"ratio {wp / wg:.2f}x", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
