"""Round-5: MMEB eval-loop throughput at llava-v1.5-7b shapes (VERDICT r4
Next #7 — "run the eval loop end-to-end through the embedding path and
report pairs/s").

Drives the REAL eval stack — evals/mmeb.evaluate_subset over
make_embedding_encoders(EmbeddingScorer) — on a synthetic multi-subset
fixture, exactly the code path cli/eval_mmeb.py runs (reference:
VLM2Vec/eval.py:31-180), with random W8A8 7B weights (zero egress;
throughput is shape-determined). End-to-end wall-clock includes host
tokenize + pad + image preprocess + device dispatch + the scoring loop,
i.e. the number a user of the eval CLI sees, unlike the device-only
`vlm2vec_int8_embed_per_s` bench leg.

Reports per subset: rows/s, encoded pairs/s (dedup'd qry+tgt encodes), and
the second-pass pickle-cache-hit wall time (VLM2Vec/eval.py:31+ cache
semantics).

Run: python perf/experiments/exp_mmeb_eval.py [n_rows_per_subset]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from clip_embeds_tpu.core.compile_cache import enable_persistent_cache
from clip_embeds_tpu.evals.mmeb import evaluate_subset, make_embedding_encoders
from clip_embeds_tpu.models.llava import Llava, LlavaConfig, llava_tiny_config
from clip_embeds_tpu.models.quant import (
    LLAMA_QUANT_LAYER_NAMES,
    quantize_tree_on_device,
)
from clip_embeds_tpu.scores.embedding_scorer import EmbeddingScorer

enable_persistent_cache()


def _toy_tokenize(text):
    import zlib

    return [1] + [2 + (zlib.crc32(w.encode()) % 29000) for w in text.split()]


def build_random_device_params(model, init_args):
    shapes = jax.eval_shape(
        lambda k: model.init(k, *init_args)["params"], jax.random.PRNGKey(0)
    )
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, len(leaves))
        out = []
        for k, leaf in zip(ks, leaves):
            if len(leaf.shape) >= 2:
                out.append(jax.random.normal(k, leaf.shape, jnp.bfloat16)
                           * 0.02)
            else:
                out.append(jnp.ones(leaf.shape, jnp.bfloat16))
        return out

    return jax.tree.unflatten(treedef, mk(jax.random.PRNGKey(1)))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tiny = jax.default_backend() != "tpu"
    cfg = llava_tiny_config() if tiny else LlavaConfig()
    img = cfg.vision.image_size

    model = Llava(cfg, dtype=jnp.bfloat16)
    init_args = (
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, img, img, 3), jnp.bfloat16),
    )
    print(f"building params ({'tiny' if tiny else '7B'}) on device ...")
    params = build_random_device_params(model, init_args)
    print("quantizing trunk (W8A8 — the single-chip serving path) ...")
    lm = dict(params["language_model"])
    lm["model"] = quantize_tree_on_device(
        lm["model"], LLAMA_QUANT_LAYER_NAMES, free_source=True)
    qparams = dict(params, language_model=lm)
    qmodel = Llava(cfg, dtype=jnp.bfloat16, quant_llm="dynamic")

    scorer = EmbeddingScorer(
        qmodel, qparams, _toy_tokenize, bos_token_id=1, pad_token_id=0,
        batch_size=16, max_len=128,
    )
    encode_queries, encode_targets = make_embedding_encoders(scorer)

    # synthetic multi-subset fixture: a retrieval-ish subset (text targets,
    # shared candidate pool — heavy dedup like ImageNet-1K) and a VQA-ish
    # subset (per-row answer strings — little dedup). Query images are real
    # JPEG files so the end-to-end number includes host decode (the C++
    # pipeline preprocess_batch routes paths through).
    rng = np.random.default_rng(0)
    img_dir = tempfile.mkdtemp(prefix="mmeb_eval_imgs_")
    from PIL import Image

    base = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    img_paths = []
    for i in range(n_rows):
        p = os.path.join(img_dir, f"im_{i:05d}.jpg")
        Image.fromarray(np.roll(base, i * 11, axis=0)).save(p, quality=90)
        img_paths.append(p)

    pool = [f"class label {j} with words {j % 7} {j % 13}" for j in range(64)]
    subsets = {}
    subsets["Retrieval-like"] = [
        {
            "qry_text": f"what class is image {i}?",
            "qry_img_path": img_paths[i],
            "tgt_text": [pool[(i + k) % 64] for k in range(4)],
            "tgt_img_path": ["", "", "", ""],
        }
        for i in range(n_rows)
    ]
    subsets["VQA-like"] = [
        {
            "qry_text": f"answer question {i} about the image",
            "qry_img_path": img_paths[i],
            "tgt_text": [f"unique answer {i} option {k}" for k in range(4)],
            "tgt_img_path": ["", "", "", ""],
        }
        for i in range(n_rows)
    ]

    cache_dir = tempfile.mkdtemp(prefix="mmeb_eval_perf_")
    try:
        for name, rows in subsets.items():
            n_qry = len({(r["qry_text"], r["qry_img_path"]) for r in rows})
            n_tgt = len({t for r in rows for t in r["tgt_text"]})
            # warm compile outside the measured window (first call compiles
            # the embed graphs for this pad bucket)
            encode_queries([(rows[0]["qry_text"], rows[0]["qry_img_path"])])
            encode_targets([(rows[0]["tgt_text"][0], "")])
            t0 = time.perf_counter()
            res = evaluate_subset(
                rows, encode_queries, encode_targets,
                cache_dir=cache_dir, subset=name,
            )
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            evaluate_subset(
                rows, encode_queries, encode_targets,
                cache_dir=cache_dir, subset=name,
            )
            dt_cached = time.perf_counter() - t0
            print(
                f"{name}: {len(rows)} rows, {n_qry}+{n_tgt} unique encodes "
                f"-> {len(rows) / dt:.2f} rows/s, "
                f"{(n_qry + n_tgt) / dt:.2f} encoded pairs/s "
                f"(end-to-end {dt:.1f}s; cache-hit re-eval {dt_cached:.2f}s; "
                f"acc {res['acc']:.3f})"
            )
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
