"""Round-4: scan-trunk LLaVA-7B probe — compile time + bf16 servability.

The unrolled 32-layer 7B graphs compile in ~10 min each over the remote-TPU
transport, and some bf16 graphs reproducibly crash the compile helper
(HTTP 500 — bench.py vqa leg). Hypothesis: both are HLO-size pathologies;
the scan trunk (models/llama.py scan_layers — one compiled layer body) is
~32x smaller.

Measures, for the KV-reuse VQA composite (prefill + batched suffix scores)
at the llava-v1.5-7b shapes: wall-clock compile time and steady-state
scores/s for (a) bf16 scan trunk, (b) int8-dynamic scan trunk; compares the
int8 rate against the unrolled kernel numbers in BENCH r4.

Run: python perf/experiments/exp_llava_scan.py [bf16 int8]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from clip_embeds_tpu.models.llava import (
    IMAGE_TOKEN_INDEX,
    Llava,
    LlavaConfig,
    extract_prefix_kv,
)
from clip_embeds_tpu.scores.vqa_score import _exp_neg_mean_ce

CFG = LlavaConfig()
N_TEXTS, LP_PAD, LS = 8, 64, 16
PREFIX_LEN, SENTINEL = 48, 36


def inputs():
    rng = np.random.default_rng(3)
    prefix_ids = np.zeros((1, LP_PAD), np.int32)
    prefix_ids[0, :PREFIX_LEN] = rng.integers(2, 31000, PREFIX_LEN)
    prefix_ids[0, 0] = 1
    prefix_ids[0, SENTINEL] = IMAGE_TOKEN_INDEX
    prefix_valid = np.zeros((1, LP_PAD), bool)
    prefix_valid[0, :PREFIX_LEN] = True
    suffix_ids = rng.integers(2, 31000, (N_TEXTS, LS)).astype(np.int32)
    suffix_mask = np.ones((N_TEXTS, LS), bool)
    suffix_mask[:, -2:] = False
    labels = np.full((N_TEXTS, LS), -100, np.int32)
    labels[:, 10:14] = suffix_ids[:, 10:14]
    pixels = rng.standard_normal((1, 336, 336, 3)).astype(np.float32)
    return {
        "prefix_ids": jnp.asarray(prefix_ids),
        "prefix_valid": jnp.asarray(prefix_valid),
        "suffix_ids": jnp.asarray(suffix_ids),
        "suffix_mask": jnp.asarray(suffix_mask),
        "labels": jnp.asarray(labels),
        "pixels": jnp.asarray(pixels, jnp.bfloat16),
        "real_f": jnp.asarray(PREFIX_LEN - 1 + CFG.n_image_tokens, jnp.int32),
    }


def build_scan_params(model, dev):
    """Random bf16 7B params at the SCAN layout, generated on device."""
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, dev["prefix_ids"],
            jnp.zeros((1, 336, 336, 3), jnp.bfloat16))["params"],
        jax.random.PRNGKey(0),
    )
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, len(leaves))
        return [
            jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02
            if len(l.shape) >= 2 else jnp.ones(l.shape, jnp.bfloat16)
            for k, l in zip(ks, leaves)
        ]

    return jax.tree.unflatten(treedef, mk(jax.random.PRNGKey(1)))


def probe(precision: str):
    dev = inputs()
    if precision == "int8":
        model = Llava(CFG, dtype=jnp.bfloat16, scan_llm=True,
                      quant_llm="dynamic")
        bf16_model = Llava(CFG, dtype=jnp.bfloat16, scan_llm=True)
        params = build_scan_params(bf16_model, dev)
        from clip_embeds_tpu.models.quant import (
            LLAMA_QUANT_LAYER_NAMES,
            quantize_tree_on_device,
        )

        lm = dict(params["language_model"])
        lm["model"] = quantize_tree_on_device(
            lm["model"], LLAMA_QUANT_LAYER_NAMES, free_source=True)
        params = dict(params, language_model=lm)
    else:
        model = Llava(CFG, dtype=jnp.bfloat16, scan_llm=True)
        params = build_scan_params(model, dev)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    @jax.jit
    def kv_scores_loop(p, salt0, iters):
        def body(_, salt):
            px = dev["pixels"] + salt.astype(jnp.bfloat16)
            pmask, mut = model.apply(
                {"params": p}, dev["prefix_ids"], px, dev["prefix_valid"],
                method="prefill", mutable=["kv"],
            )
            kv = extract_prefix_kv(mut["kv"], CFG.llama.num_layers)
            logits = model.apply(
                {"params": p}, dev["suffix_ids"], kv, pmask,
                dev["suffix_mask"], dev["real_f"], method="suffix_logits",
            )
            scores = _exp_neg_mean_ce(
                logits[:, :-1].astype(jnp.float32), dev["labels"][:, 1:])
            return jnp.sum(scores) * 1e-6
        return jax.lax.fori_loop(0, iters, body, salt0)

    t0 = time.perf_counter()
    float(kv_scores_loop(params, jnp.asarray(1e-6), 1))
    compile_s = time.perf_counter() - t0
    float(kv_scores_loop(params, jnp.asarray(1e-6), 4))
    t0 = time.perf_counter(); float(kv_scores_loop(params, jnp.asarray(1e-6), 1))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(kv_scores_loop(params, jnp.asarray(1e-6), 4))
    tl = time.perf_counter() - t0
    per = max(tl - ts, 0.1 * tl) / 3
    print(f"scan {precision}: compile+first-run {compile_s:7.1f}s | "
          f"{N_TEXTS / per:7.2f} scores/s/chip", flush=True)


if __name__ == "__main__":
    for p in (sys.argv[1:] or ["bf16", "int8"]):
        probe(p)
