"""Benchmark: ViT-L/14-336 image-embedding throughput (images/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline path: the W8A8 fused-block serving kernel (ops/fused_block.py),
gated by an in-bench accuracy check — the int8 embeddings must reach
cosine >= 0.99 against the bf16 fused path on the bench batch, else the
headline falls back to bf16. Deeper validation (cross-distribution cosine +
top-1 agreement, one-command revalidation on real weights):
`python -m clip_embeds_tpu.cli.validate_int8`.

Round-4 extra legs: `e2e_img_per_s` (host JPEG decode overlapped with the
device via PrefetchLoader — the end-to-end number the device-only headline
excludes; host-bound on few-core machines) and the `vqa_*` family
(LLaVA-1.5-7B VQAScore serving: bf16-fit probe, scores/s/chip and prefill
tokens/s for bf16 / int8-dynamic / int8-static trunks, and the measured
KV-prefix-reuse speedup vs the reference-shaped per-pair forward).

Baseline: the reference stack embeds images through torch CLIP ViT-L/14-336
with fp16 autocast + SDPA on an A100. We keep a CONSERVATIVE constant of
1000 img/s/GPU as the divisor. For calibration: public open_clip inference
tables put ViT-L/14 @224 around 1100-1300 img/s fp16 on A100; @336 has
2.25x the tokens (577 vs 257), so a realistic A100 number is ~450-550
img/s. Hardware context: A100 fp16 peak is 312 TFLOPs vs v5e bf16 197
TFLOPs (int8 ~394); at ~350 GFLOP/image the v5e bf16 speed-of-light is
~560 img/s — the int8 MXU path is what makes the 2x-A100-constant target
reachable on this chip. Both paths' numbers ride in the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

A100_BASELINE_IMG_PER_S = 1000.0
INT8_MIN_COS = 0.99

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    """Timestamped progress marker on stderr (stdout carries only the JSON
    line). First-ever run pays multi-minute cold XLA compiles per path over
    the axon tunnel; these markers show where a long run is spending time."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from clip_embeds_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    from clip_embeds_tpu.core.factory import create_model
    from clip_embeds_tpu.image.preprocess import jax_preprocess

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 8

    # openai tag => QuickGELU, matching the real deployed checkpoint
    model, params = create_model("ViT-L-14-336", pretrained="openai",
                                 dtype=jnp.bfloat16)
    params = jax.device_put(params)
    size = model.cfg.vision.image_size

    from clip_embeds_tpu.models.serving import (
        fused_encode_image,
        fused_path_available,
    )

    use_fused = on_tpu and fused_path_available(model)

    def embed_bf16(params, raw_u8, salt):
        images = jax_preprocess(raw_u8, size, "clip", jnp.bfloat16)
        images = images + salt.astype(jnp.bfloat16)
        if use_fused:
            return fused_encode_image(model, params, images, normalize=True)
        return model.apply(
            {"params": params}, images, normalize=True, method="encode_image"
        )

    raw = np.random.default_rng(0).integers(
        0, 255, (batch, size, size, 3), dtype=np.uint8
    )
    raw = jax.device_put(jnp.asarray(raw))

    # Timing notes for the axon remote platform: block_until_ready returns
    # immediately (only host fetches force execution) and every dispatch pays
    # tunnel latency. So the whole iteration loop runs on-device inside one
    # jit (lax.fori_loop chained through a salt scalar), and the per-iteration
    # time is the difference between a long and a short loop — constant
    # dispatch/fetch overhead cancels. The trip count is a DYNAMIC argument so
    # each path compiles once.
    def make_loop(embed_fn):
        @jax.jit
        def loop(params, raw, iters):
            def body(_, salt):
                out = embed_fn(params, raw, salt)
                return out[0, 0].astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))
        return loop

    def time_path(loop, params, iters):
        float(loop(params, raw, 1))          # compile + warm
        float(loop(params, raw, iters))
        t0 = time.perf_counter()
        float(loop(params, raw, 1))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, raw, iters))
        t_long = time.perf_counter() - t0
        elapsed = max(t_long - t_short, 1e-9) / (iters - 1) * iters
        return batch * iters / elapsed

    iters = 20 if on_tpu else 2
    _progress("bf16 image path: compile + time")
    bf16_ips = time_path(make_loop(embed_bf16), params, iters)
    _progress(f"bf16 image path done: {bf16_ips:.1f} img/s")
    zero_salt = jnp.asarray(0.0)
    bf16_out = np.asarray(embed_bf16(params, raw, zero_salt), np.float32)

    int8_ips = None
    int8_cos = None
    if use_fused:
        from clip_embeds_tpu.models.serving import (
            fused_encode_image_int8,
            prepare_int8_tower,
        )

        # one-time calibration prep on host CPU (the dynamic-quant
        # observation model compiles pathologically slowly over the tunnel);
        # 16 images suffice for the abs-max statistics and keep the CPU
        # forward of the ViT-L observation model cheap
        _progress("int8 image path: CPU calibration")

        def _calib_image():
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                calib = np.asarray(jax_preprocess(
                    jnp.asarray(np.asarray(raw)[:16]), size, "clip",
                    jnp.float32))
                return prepare_int8_tower(
                    model, jax.device_get(params), jnp.asarray(calib))

        qtower = _disk_cached_tree("int8_image_vitl14_336", _calib_image)
        bundle = jax.device_put(
            {"fp": jax.device_get(params), "q": jax.device_get(qtower)}
        )

        def embed_int8(p, raw_u8, salt):
            images = jax_preprocess(raw_u8, size, "clip", jnp.bfloat16)
            images = images + salt.astype(jnp.bfloat16)
            return fused_encode_image_int8(
                model, p["fp"], p["q"], images, normalize=True
            )

        _progress("int8 image path: compile + time")
        loop_q = make_loop(embed_int8)
        int8_ips = time_path(loop_q, bundle, iters)
        _progress(f"int8 image path done: {int8_ips:.1f} img/s")
        q_out = np.asarray(
            jax.jit(embed_int8)(bundle, raw, zero_salt), np.float32
        )
        int8_cos = float((bf16_out * q_out).sum(-1).mean())

    if int8_ips is not None and int8_cos is not None \
            and int8_cos >= INT8_MIN_COS:
        headline, path = int8_ips, "int8_w8a8_fused"
    else:
        headline, path = bf16_ips, "bf16_fused" if use_fused else "bf16"

    record = {
        "metric": "vit_l14_336_embed_images_per_sec_per_chip",
        "value": round(headline, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(headline / A100_BASELINE_IMG_PER_S, 3),
        "headline_path": path,
        "bf16_img_per_s": round(bf16_ips, 2),
    }
    if on_tpu:
        # Chip speed-of-light for this model/path (PERF.md "Round 3: serving
        # speed-of-light"): int8 projections at 100% of the v5e 394 TOPS peak
        # + bf16 attention at 100% of 197 TFLOPs, zero overhead, CLS-only
        # last block. The 2x-A100 divisor (1000) sits ABOVE this number —
        # pct_of_chip_peak_sol is the honest utilization metric.
        sol = _chip_peak_sol_img_per_s(model.cfg.vision)
        record["sol_img_per_s_chip_peak"] = round(sol, 1)
        record["pct_of_chip_peak_sol"] = round(headline / sol, 3)
    if int8_ips is not None:
        record["int8_img_per_s"] = round(int8_ips, 2)
        record["int8_cos_vs_bf16"] = round(int8_cos, 5)

    # full serving surface in one artifact (round-3): the ViT-L text tower
    # and the SigLIP so400m image tower ride along as extras
    if use_fused:
        try:
            _progress("text tower paths")
            record.update(_bench_text_tower(
                jax, jnp, np, model, params, batch))
        except Exception as e:  # keep the headline robust
            record["text_tower_error"] = f"{type(e).__name__}: {e}"
        try:
            _progress("siglip so400m path")
            record.update(_bench_siglip_so400m(jax, jnp, np))
        except Exception as e:
            record["siglip_error"] = f"{type(e).__name__}: {e}"
        try:
            _progress("end-to-end serving (host decode + device, overlapped)")
            record.update(_bench_e2e_serving(jax, jnp, np, model, params))
        except Exception as e:
            record["e2e_error"] = f"{type(e).__name__}: {e}"

    if on_tpu:
        # the multi-GB model legs each need most of HBM — drop every buffer
        # the earlier legs held before each one
        import gc

        try:
            _progress("vqa llava-7b leg: freeing earlier buffers")
            del params, raw
            gc.collect()
            record.update(_bench_vqa(jax, jnp, np))
        except Exception as e:
            record["vqa"] = _skip("LLaVA VQA leg crashed", e)
        try:
            _progress("t5 clip-flant5 leg (reference default VQA model)")
            gc.collect()
            record.update(_bench_t5(jax, jnp, np))
        except Exception as e:
            record["t5"] = _skip("CLIP-FlanT5 leg crashed", e)
        try:
            _progress("vlm2vec embed + train leg")
            gc.collect()
            record.update(_bench_vlm2vec(jax, jnp, np))
        except Exception as e:
            record["vlm2vec"] = _skip("VLM2Vec leg crashed", e)
        try:
            _progress("qwen2-vl embed leg")
            gc.collect()
            record.update(_bench_qwen2vl(jax, jnp, np))
        except Exception as e:
            record["qwen2vl"] = _skip("Qwen2-VL leg crashed", e)
    _progress("done")
    print(json.dumps(record))


def _short_err(e) -> str:
    """One-line sanitized error string for the JSON artifact: no embedded
    tracebacks, newlines or ANSI escapes (BENCH_r04 carried raw axon
    tracebacks mid-JSON — VERDICT r4 Weak #4)."""
    import re

    msg = f"{type(e).__name__}: {e}"
    msg = re.sub(r"\x1b\[[0-9;]*m", "", msg)       # ANSI colors
    msg = " ".join(msg.split())                      # newlines/runs of space
    return msg[:160]


def _skip(reason: str, error=None) -> dict:
    """Structured skip object: a leg that cannot run records WHY instead of
    a raw traceback; `reason` says what this means for deployment."""
    out = {"skipped": reason}
    if error is not None:
        out["error"] = _short_err(error)
    return out


def _disk_cached_tree(key: str, build):
    """Disk-cache a deterministic pytree of numpy arrays (int8 calibration).

    The W8A8 calibration forward runs the fp32 observation tower on host CPU
    — measured ~4.7 min per bench invocation for the ViT-L image tower, every
    run, because XLA's compile cache can't help host-side numerics. The
    calibration is deterministic (fixed rng seeds, fixed init), so it is
    cached like a compile artifact under .bench_cache/. Delete the directory
    to force recalibration (e.g. after quantizer changes — the key embeds
    the clip_embeds_tpu quant-schema version)."""
    import os
    import pickle

    from clip_embeds_tpu.models import serving as _s

    schema = getattr(_s, "QUANT_SCHEMA_VERSION", 1)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    path = os.path.join(cache_dir, f"{key}_v{schema}.pkl")
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        pass
    import jax

    tree = jax.tree.map(lambda a: jax.device_get(a), build())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(tree, f)
        os.replace(tmp, path)
    except Exception:
        pass
    return tree


def _chip_peak_sol_img_per_s(vcfg) -> float:
    """Tower-only img/s if every matmul ran at 100% of v5e peak.

    Projections (qkv + out-proj + MLP = width²·(4 + 2·mlp_ratio) MACs/token)
    at the int8 MXU peak, attention (2·n²·width MACs) at the bf16 peak (int8
    attention measured slower and below the accuracy gate — PERF.md round 3),
    23 full layers + the CLS-only last block (its q/proj/MLP rows collapse
    to 1; only k/v over the sequence remain ≈ 2/(4+2·mlp_ratio) of a layer's
    projection MACs). Softmax/quantize/IO assumed free: an upper bound.
    """
    int8_peak, bf16_peak = 394e12, 197e12
    n = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
    proj = n * vcfg.width ** 2 * (4 + 2 * vcfg.mlp_ratio)
    attn = 2 * n * n * vcfg.width
    t_full = 2 * proj / int8_peak + 2 * attn / bf16_peak
    t_last = 2 * proj * (2 / (4 + 2 * vcfg.mlp_ratio)) / int8_peak
    return 1.0 / ((vcfg.layers - 1) * t_full + t_last)


def _bench_text_tower(jax, jnp, np, model, params, img_batch):
    """ViT-L/14-336 text tower texts/s/chip: fused bf16 + W8A8 (gated on
    cosine vs bf16 like the image headline). PERF.md round 2: 11.2k bf16 /
    13.3k int8 texts/s."""
    from clip_embeds_tpu.models.serving import (
        fused_encode_text,
        fused_encode_text_int8,
        prepare_int8_text_tower,
    )

    batch = 2048 if img_batch >= 256 else 8
    ctx = model.cfg.text.context_length
    rng = np.random.default_rng(1)
    ids = np.concatenate([
        np.full((batch, 1), 49406),
        rng.integers(1000, 40000, (batch, ctx - 2)),
        np.full((batch, 1), 49407),
    ], axis=1).astype(np.int32)
    ids = jax.device_put(jnp.asarray(ids))

    # int32 salt chain (exp_texttower.py): shift the interior token ids per
    # iteration so XLA cannot hoist the loop body
    def make_txt_loop(encode):
        @jax.jit
        def loop(p, ids_, iters):
            def body(_, salt):
                shifted = jnp.where(
                    (ids_ > 999) & (ids_ < 40000), ids_ + salt % 997, ids_)
                out = encode(p, shifted)
                return salt + 1 + (out[0, 0] * 1e-6).astype(jnp.int32)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.asarray(0, jnp.int32))
        return loop

    def time_txt(loop, p, iters):
        import time as _t

        int(loop(p, ids, 1))
        int(loop(p, ids, iters))
        t0 = _t.perf_counter(); int(loop(p, ids, 1))
        ts = _t.perf_counter() - t0
        t0 = _t.perf_counter(); int(loop(p, ids, iters))
        tl = _t.perf_counter() - t0
        return batch * iters / (max(tl - ts, 1e-9) / (iters - 1) * iters)

    def embed_txt(p, ids_):
        return fused_encode_text(model, p, ids_, normalize=True)

    bf16_tps = time_txt(make_txt_loop(embed_txt), params, 20)
    bf16_out = np.asarray(
        jax.jit(embed_txt)(params, ids), np.float32)

    def _calib_text():
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return prepare_int8_text_tower(
                model, jax.device_get(params),
                jnp.asarray(np.asarray(ids)[:64]))

    qtower = _disk_cached_tree("int8_text_vitl14_336", _calib_text)
    bundle = jax.device_put(
        {"fp": jax.device_get(params), "q": jax.device_get(qtower)})

    def embed_txt_q(p, ids_):
        return fused_encode_text_int8(model, p["fp"], p["q"], ids_,
                                      normalize=True)

    int8_tps = time_txt(make_txt_loop(embed_txt_q), bundle, 20)
    q_out = np.asarray(
        jax.jit(embed_txt_q)(bundle, ids), np.float32)
    cos = float((bf16_out * q_out).sum(-1).mean())
    out = {
        "text_bf16_texts_per_s": round(bf16_tps, 1),
        "text_int8_texts_per_s": round(int8_tps, 1),
        "text_int8_cos_vs_bf16": round(cos, 5),
    }
    return out


def _bench_siglip_so400m(jax, jnp, np):
    """SigLIP so400m-patch14-384 image tower: fused bf16 + W8A8 int8 (gated
    on cosine vs bf16 like the ViT-L image headline)."""
    import time as _t

    from clip_embeds_tpu.models.serving import (
        fused_encode_image_siglip,
        fused_encode_image_siglip_int8,
        prepare_int8_siglip_tower,
        siglip_fused_available,
    )
    from clip_embeds_tpu.models.siglip import (
        Siglip,
        SiglipConfig,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=384, patch_size=14, width=1152,
                                  layers=27, heads=16,
                                  intermediate_size=4304),
        text=SiglipTextConfig(),
    )
    if not siglip_fused_available(cfg.vision):
        return {}
    model = Siglip(cfg, dtype=jnp.bfloat16)
    init_model = Siglip(cfg, dtype=jnp.float32, attn_impl="reference")
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.device_get(init_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3), jnp.float32),
            jnp.zeros((1, 64), jnp.int32))["params"])
    params = jax.device_put(jax.tree.map(jnp.asarray, params))
    batch = 128
    raw = jax.device_put(jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (batch, 384, 384, 3), dtype=np.uint8)))

    def prep(raw_u8, salt):
        img = raw_u8.astype(jnp.bfloat16) / 127.5 - 1.0  # inception stats
        return img + salt.astype(jnp.bfloat16)

    def embed(p, raw_u8, salt):
        return fused_encode_image_siglip(
            model, p, prep(raw_u8, salt), normalize=True)

    def make_loop(encode):
        @jax.jit
        def loop(p, raw_, iters):
            def body(_, salt):
                out = encode(p, raw_, salt)
                return out[0, 0].astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))
        return loop

    def time_loop(loop, p):
        float(loop(p, raw, 1))
        float(loop(p, raw, 10))
        t0 = _t.perf_counter(); float(loop(p, raw, 1))
        ts = _t.perf_counter() - t0
        t0 = _t.perf_counter(); float(loop(p, raw, 10))
        tl = _t.perf_counter() - t0
        return batch * 10 / (max(tl - ts, 1e-9) / 9 * 10)

    ips = time_loop(make_loop(embed), params)
    out = {"siglip_so400m_bf16_img_per_s": round(ips, 1)}

    def _calib():
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            calib = np.asarray(
                prep(jnp.asarray(np.asarray(raw)[:4]), jnp.asarray(0.0)),
                np.float32)
            return prepare_int8_siglip_tower(
                init_model, jax.device_get(params), jnp.asarray(calib))

    qtower = _disk_cached_tree("int8_siglip_so400m", _calib)
    bundle = jax.device_put(
        {"fp": jax.device_get(params), "q": jax.device_get(qtower)})

    def embed_q(b, raw_u8, salt):
        return fused_encode_image_siglip_int8(
            model, b["fp"], b["q"], prep(raw_u8, salt), normalize=True)

    int8_ips = time_loop(make_loop(embed_q), bundle)
    zero = jnp.asarray(0.0)
    bf16_out = np.asarray(jax.jit(embed)(params, raw, zero), np.float32)
    q_out = np.asarray(jax.jit(embed_q)(bundle, raw, zero), np.float32)
    cos = float((bf16_out * q_out).sum(-1).mean())
    out["siglip_so400m_int8_img_per_s"] = round(int8_ips, 1)
    out["siglip_so400m_int8_cos_vs_bf16"] = round(cos, 5)
    return out


def _bench_e2e_serving(jax, jnp, np, model, params):
    """End-to-end serving: host JPEG decode (PrefetchLoader, C++ pipeline)
    overlapped with device embed — the number the device-only headline
    excludes. Synthesizes a deterministic JPEG corpus once into
    .bench_cache/e2e_jpegs; the measured figure is HOST-bound on few-core
    machines (each --fast-jpeg core feeds ~88 img/s; a 628 img/s chip
    saturates at ~8 cores), so host_cores rides along in the record."""
    import os
    import time as _t

    from clip_embeds_tpu.image.loader import PrefetchLoader
    from clip_embeds_tpu.models.serving import fused_encode_image

    n_images = 768
    size = model.cfg.vision.image_size
    corpus = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache", "e2e_jpegs")
    if not os.path.isdir(corpus) or \
            len(os.listdir(corpus)) < n_images:
        from PIL import Image

        os.makedirs(corpus, exist_ok=True)
        rng = np.random.default_rng(7)
        base = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
        for i in range(n_images):
            # cheap variety: roll the base image (decode cost is what matters)
            arr = np.roll(base, i * 7, axis=1)
            Image.fromarray(arr).save(
                os.path.join(corpus, f"img_{i:05d}.jpg"), quality=90)
    paths = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
    )[:n_images]

    batch = 128

    @jax.jit
    def embed(p, px):
        return fused_encode_image(model, p, px.astype(jnp.bfloat16),
                                  normalize=True)

    # warm the compile + device path outside the measured window
    warm = jnp.zeros((batch, size, size, 3), jnp.float32)
    np.asarray(embed(params, warm))

    host_cores = os.cpu_count() or 1
    t0 = _t.perf_counter()
    outs = []
    loader = PrefetchLoader(paths, batch_size=batch, image_size=size,
                            fast_jpeg=True, num_threads=host_cores)
    carry = []
    seen = 0
    for chunk, arrs, ok in loader:
        for arr, good in zip(arrs, ok):
            if not good:
                continue
            carry.append(arr)
            if len(carry) == batch:
                outs.append(embed(params, jnp.asarray(np.stack(carry))))
                seen += batch
                carry = []
    for o in outs:
        np.asarray(o)  # force all fetches: end-to-end includes the last batch
    elapsed = _t.perf_counter() - t0
    return {
        "e2e_img_per_s": round(seen / elapsed, 1),
        "e2e_images": seen,
        "e2e_host_cores": host_cores,
        "e2e_fast_jpeg": True,
    }


def _bench_vqa(jax, jnp, np):
    """LLaVA-1.5-7B VQAScore serving leg (the BASELINE config with no prior
    perf characterization — VERDICT r3 item 1).

    Establishes (a) what fits one v5e chip: the bf16 trunk is 13.5 GB —
    measured here if it fits alongside activations; the W8A8 trunk is ~6.9 GB
    and always fits; (b) the KV-prefix-reuse speedup: scores/s for one image
    x 8 candidate texts through models/llava.py prefill+suffix_logits vs the
    reference-shaped per-pair full forward (t2v_metrics score.py:43-57);
    (c) prefill tokens/s. Weights are random (zero egress) at the exact
    llava-v1.5-7b shapes; timing is shape-determined.
    """
    import time as _t

    from clip_embeds_tpu.models.llava import (
        IMAGE_TOKEN_INDEX,
        Llava,
        LlavaConfig,
        extract_prefix_kv,
    )
    from clip_embeds_tpu.models.quant import (
        LLAMA_QUANT_LAYER_NAMES,
        quantize_tree_on_device,
    )
    from clip_embeds_tpu.scores.vqa_score import _exp_neg_mean_ce

    import os

    if os.environ.get("BENCH_VQA_TINY"):  # CPU smoke-test hook (tests)
        from clip_embeds_tpu.models.llava import llava_tiny_config

        cfg = llava_tiny_config()
    else:
        cfg = LlavaConfig()  # llava-v1.5-7b: 32L x 4096 trunk + ViT-L/14-336
    n_layers = cfg.llama.num_layers
    n_image = cfg.n_image_tokens  # 576 at the 7B shape
    img_size = cfg.vision.image_size
    hi_tok = min(31000, cfg.llama.vocab_size - 1)

    # real chat-template shape: ~35 system + <image> + ~12 shared question
    # tokens; 8 candidates x ~14-token suffixes with a 4-token answer span
    n_texts, lp_pad, ls = 8, 64, 16
    prefix_len, sentinel_pos = 48, 36
    rng = np.random.default_rng(3)
    prefix_ids = np.zeros((1, lp_pad), np.int32)
    prefix_ids[0, :prefix_len] = rng.integers(2, hi_tok, prefix_len)
    prefix_ids[0, 0] = 1
    prefix_ids[0, sentinel_pos] = IMAGE_TOKEN_INDEX
    prefix_valid = np.zeros((1, lp_pad), bool)
    prefix_valid[0, :prefix_len] = True
    suffix_ids = rng.integers(2, hi_tok, (n_texts, ls)).astype(np.int32)
    suffix_mask = np.ones((n_texts, ls), bool)
    suffix_mask[:, -2:] = False
    labels = np.full((n_texts, ls), -100, np.int32)
    labels[:, 10:14] = suffix_ids[:, 10:14]
    pixels = rng.standard_normal((1, img_size, img_size, 3)).astype(np.float32)
    real_f = prefix_len - 1 + n_image

    dev = {
        "prefix_ids": jnp.asarray(prefix_ids),
        "prefix_valid": jnp.asarray(prefix_valid),
        "suffix_ids": jnp.asarray(suffix_ids),
        "suffix_mask": jnp.asarray(suffix_mask),
        "labels": jnp.asarray(labels),
        "pixels": jnp.asarray(pixels, jnp.bfloat16),
        "real_f": jnp.asarray(real_f, jnp.int32),
    }

    def build_params(model):
        """Random bf16 params at full 7B shape, generated ON DEVICE (a host
        build + device_put of 13.5 GB over the axon tunnel is minutes-slow).
        2-d+ leaves ~ N(0, 0.02); 1-d/scalar leaves (norm gains, biases,
        logit scales) = 1 so activations neither explode nor collapse."""
        shapes = jax.eval_shape(
            lambda k: model.init(
                k, dev["prefix_ids"],
                jnp.zeros((1, img_size, img_size, 3), jnp.bfloat16))["params"],
            jax.random.PRNGKey(0),
        )
        leaves, treedef = jax.tree.flatten(shapes)

        @jax.jit
        def mk(key):
            ks = jax.random.split(key, len(leaves))
            out = []
            for k, leaf in zip(ks, leaves):
                if len(leaf.shape) >= 2:
                    out.append(
                        jax.random.normal(k, leaf.shape, jnp.bfloat16) * 0.02)
                else:
                    out.append(jnp.ones(leaf.shape, jnp.bfloat16))
            return out
        return jax.tree.unflatten(treedef, mk(jax.random.PRNGKey(1)))

    def timed_loop(loop, p, iters=4):
        float(loop(p, jnp.asarray(1e-6), 1))
        float(loop(p, jnp.asarray(1e-6), iters))
        t0 = _t.perf_counter(); float(loop(p, jnp.asarray(1e-6), 1))
        ts = _t.perf_counter() - t0
        t0 = _t.perf_counter(); float(loop(p, jnp.asarray(1e-6), iters))
        tl = _t.perf_counter() - t0
        # floor at 10% of the long run per iteration: under host-timing
        # noise (shared-CPU smoke runs) the difference can collapse to ~0
        return max(tl - ts, 0.1 * tl) / (iters - 1)

    def make_legs(model):
        """(scores_loop, prefill_loop, pair_loop, scores_once) for a model."""

        def kv_scores(p, salt):
            px = dev["pixels"] + salt.astype(jnp.bfloat16)
            pmask, mut = model.apply(
                {"params": p}, dev["prefix_ids"], px, dev["prefix_valid"],
                method="prefill", mutable=["kv"],
            )
            kv = extract_prefix_kv(mut["kv"], n_layers)
            logits = model.apply(
                {"params": p}, dev["suffix_ids"], kv, pmask,
                dev["suffix_mask"], dev["real_f"], method="suffix_logits",
            )
            return _exp_neg_mean_ce(
                logits[:, :-1].astype(jnp.float32), dev["labels"][:, 1:])

        def prefill_only(p, salt):
            px = dev["pixels"] + salt.astype(jnp.bfloat16)
            _, mut = model.apply(
                {"params": p}, dev["prefix_ids"], px, dev["prefix_valid"],
                method="prefill", mutable=["kv"],
            )
            kv = extract_prefix_kv(mut["kv"], n_layers)
            return kv[-1][0][0, 0, 0, 0].astype(jnp.float32)

        # reference-shaped pair path: the image repeated per text, full
        # forward + all-position logits per pair (score.py:43-57)
        pair_prefix = jnp.asarray(
            np.repeat(prefix_ids[:, :prefix_len], n_texts, axis=0))
        pair_ids = jnp.concatenate([pair_prefix, dev["suffix_ids"]], axis=1)
        pair_mask = jnp.concatenate([
            jnp.ones((n_texts, prefix_len), bool), dev["suffix_mask"]],
            axis=1)
        from clip_embeds_tpu.models.llava import expand_like_tokens

        def pair_scores(p, salt):
            px = jnp.broadcast_to(
                dev["pixels"] + salt.astype(jnp.bfloat16),
                (n_texts, img_size, img_size, 3))
            logits = model.apply({"params": p}, pair_ids, px, pair_mask)
            full_labels = jnp.concatenate([
                jnp.full((n_texts, prefix_len), -100, jnp.int32),
                dev["labels"]], axis=1)
            full_labels = expand_like_tokens(
                full_labels, pair_ids, n_image, -100)
            return _exp_neg_mean_ce(
                logits[:, :-1].astype(jnp.float32), full_labels[:, 1:])

        def as_loop(fn, reduce):
            @jax.jit
            def loop(p, salt0, iters):
                def body(_, salt):
                    return reduce(fn(p, salt)) * 1e-6
                return jax.lax.fori_loop(0, iters, body, salt0)
            return loop

        return (
            as_loop(kv_scores, jnp.sum),
            as_loop(prefill_only, lambda x: x),
            as_loop(pair_scores, jnp.sum),
            jax.jit(kv_scores),
        )

    out = {}
    bf16_scores = None

    model = Llava(cfg, dtype=jnp.bfloat16)
    # ORDER MATTERS for HBM: quantize FIRST from freshly built weights
    # (peak 13.5 GB + one leaf, unfragmented), run the int8 legs, then free
    # the int8 tree and REBUILD the bf16 weights from the same fixed PRNG
    # key (identical by determinism) for the bf16 legs. Quantizing after
    # the bf16 legs measured RESOURCE_EXHAUSTED: the pair path's buffers
    # fragment HBM around the resident 13.5 GB tree.
    _progress("vqa: building 7B bf16 params on device")
    params = build_params(model)

    # W8A8 trunk: quantize the same weights in place (int8 replaces bf16
    # leaf-by-leaf so peak HBM stays bounded), dynamic per-tensor act scales
    _progress("vqa int8: quantizing trunk on device")
    lm = dict(params["language_model"])
    lm["model"] = quantize_tree_on_device(
        lm["model"], LLAMA_QUANT_LAYER_NAMES, free_source=True)
    qparams = dict(params, language_model=lm)
    del params
    qmodel = Llava(cfg, dtype=jnp.bfloat16, quant_llm="dynamic")
    kv_loop_q, prefill_loop_q, pair_loop_q, scores_once_q = make_legs(qmodel)
    _progress("vqa int8: kv-reuse path compile + time")
    t_kv_q = timed_loop(kv_loop_q, qparams)
    out["vqa_int8_scores_per_s"] = round(n_texts / t_kv_q, 2)
    _progress("vqa int8: prefill-only path")
    t_prefill_q = timed_loop(prefill_loop_q, qparams)
    out["vqa_int8_prefill_tokens_per_s"] = round(real_f / t_prefill_q, 1)
    _progress("vqa int8: reference-shaped pair path")
    t_pair_q = timed_loop(pair_loop_q, qparams)
    out["vqa_int8_pair_scores_per_s"] = round(n_texts / t_pair_q, 2)
    out["vqa_int8_kv_reuse_speedup"] = round(t_pair_q / t_kv_q, 2)
    q_scores = np.asarray(
        scores_once_q(qparams, jnp.asarray(0.0)), np.float32)

    # grouped m x n leg: k=8 distinct images in ONE batched prefill + ONE
    # block-causal concatenated-suffix pass (suffix_block) — 2 dispatches
    # per k-group instead of 2 per image; the route Score.__call__ /
    # batch_forward take for multi-image calls. Exactness vs the per-image
    # path is pinned in tests/test_vqa_prefix.py and measured at 7B in
    # perf/experiments/exp_vqagroup.py. k=8 prefix KV ~2.6 GB bf16 fits
    # beside the int8 trunk.
    try:
        _progress("vqa int8: grouped k=8 m x n path")
        k_grp = 8
        g = {
            "prefix_ids": jnp.asarray(np.repeat(prefix_ids, k_grp, axis=0)),
            "prefix_valid": jnp.asarray(
                np.repeat(prefix_valid, k_grp, axis=0)),
            "suffix_ids": jnp.asarray(np.broadcast_to(
                suffix_ids.reshape(1, n_texts * ls),
                (k_grp, n_texts * ls)).copy()),
            "suffix_mask": jnp.asarray(np.broadcast_to(
                suffix_mask.reshape(1, n_texts * ls),
                (k_grp, n_texts * ls)).copy()),
            "labels": jnp.asarray(np.broadcast_to(
                labels.reshape(1, n_texts * ls),
                (k_grp, n_texts * ls)).copy()),
            "pixels": jnp.asarray(
                rng.standard_normal((k_grp, img_size, img_size, 3)),
                jnp.bfloat16),
            "real_f": jnp.asarray(
                np.full((k_grp,), real_f, np.int32)),
        }

        def grouped_scores(p, salt):
            px = g["pixels"] + salt.astype(jnp.bfloat16)
            pmask, mut = qmodel.apply(
                {"params": p}, g["prefix_ids"], px, g["prefix_valid"],
                method="prefill", mutable=["kv"],
            )
            kv = extract_prefix_kv(mut["kv"], n_layers)
            logits = qmodel.apply(
                {"params": p}, g["suffix_ids"], kv, pmask,
                g["suffix_mask"], g["real_f"], method="suffix_logits",
                suffix_block=ls,
            )
            blocks = logits.reshape(k_grp * n_texts, ls, logits.shape[-1])
            lab = g["labels"].reshape(k_grp * n_texts, ls)
            return _exp_neg_mean_ce(
                blocks[:, :-1].astype(jnp.float32), lab[:, 1:])

        @jax.jit
        def grouped_loop(p, salt0, iters):
            def body(_, salt):
                return jnp.sum(grouped_scores(p, salt)) * 1e-6
            return jax.lax.fori_loop(0, iters, body, salt0)

        t_grp_q = timed_loop(grouped_loop, qparams)
        out["vqa_int8_group8_scores_per_s"] = round(
            k_grp * n_texts / t_grp_q, 2)
        # device-loop ratio: EXCLUDES dispatch (fori_loop cancels it), so
        # ~1.0 is expected — the grouped path's actual win is fewer
        # dispatches, measured wall-clock below (VERDICT r4 Weak #4)
        out["vqa_int8_group8_vs_per_image"] = round(
            k_grp * t_kv_q / t_grp_q, 2)

        # dispatch-INCLUSIVE wall-clock: k per-image dispatch pairs vs one
        # grouped dispatch pair — the serving-relevant comparison over a
        # real transport (each dispatch pays tunnel latency)
        grouped_once = jax.jit(grouped_scores)
        np.asarray(grouped_once(qparams, jnp.asarray(0.0)))  # warm
        np.asarray(scores_once_q(qparams, jnp.asarray(0.0)))
        R = 3
        t0 = _t.perf_counter()
        for r in range(R):
            acc = [scores_once_q(qparams, jnp.asarray(1e-6 * (r + i)))
                   for i in range(k_grp)]
            for a in acc:
                np.asarray(a)
        t_wall_per_img = (_t.perf_counter() - t0) / R
        t0 = _t.perf_counter()
        for r in range(R):
            np.asarray(grouped_once(qparams, jnp.asarray(1e-6 * r)))
        t_wall_grp = (_t.perf_counter() - t0) / R
        out["vqa_int8_per_image_wall_scores_per_s"] = round(
            k_grp * n_texts / t_wall_per_img, 2)
        out["vqa_int8_group8_wall_scores_per_s"] = round(
            k_grp * n_texts / t_wall_grp, 2)
        out["vqa_int8_group8_wall_speedup"] = round(
            t_wall_per_img / t_wall_grp, 2)
        for leaf in jax.tree.leaves(g):
            try:
                leaf.delete()
            except Exception:
                pass
    except Exception as e:
        out["vqa_int8_group8"] = _skip("grouped k=8 leg failed", e)

    # static act scales: the dynamic mode pays a per-tensor abs-max
    # reduction before every projection; calibrating on the bench prompt
    # and switching to static mode removes it (the text-tower int8 win
    # only materialized in static mode — PERF.md round 2)
    try:
        _progress("vqa int8-static: calibrate + time")
        from clip_embeds_tpu.models.quant import inject_act_scales

        @jax.jit
        def _calib(p, salt):
            px = dev["pixels"] + salt.astype(jnp.bfloat16)
            pmask, st1 = qmodel.apply(
                {"params": p}, dev["prefix_ids"], px, dev["prefix_valid"],
                method="prefill", mutable=["kv", "quant_obs"],
            )
            kv = extract_prefix_kv(st1["kv"], n_layers)
            _, st2 = qmodel.apply(
                {"params": p}, dev["suffix_ids"], kv, pmask,
                dev["suffix_mask"], dev["real_f"], method="suffix_logits",
                mutable=["quant_obs"],
            )
            return jax.tree.map(
                jnp.maximum, st1["quant_obs"], st2["quant_obs"])

        obs = jax.device_get(_calib(qparams, jnp.asarray(0.0)))
        sparams = inject_act_scales(qparams, obs)
        smodel = Llava(cfg, dtype=jnp.bfloat16, quant_llm="static")
        kv_loop_s, _, _, scores_once_s = make_legs(smodel)
        t_kv_s = timed_loop(kv_loop_s, sparams)
        out["vqa_int8_static_scores_per_s"] = round(n_texts / t_kv_s, 2)
        s_scores = np.asarray(
            scores_once_s(sparams, jnp.asarray(0.0)), np.float32)
    except Exception as e:
        s_scores = None
        out["vqa_int8_static"] = _skip("static-scale calibration leg failed",
                                       e)

    # free every int8-phase device buffer, then rebuild the bf16 weights
    # from the same PRNG key (bit-identical) for the bf16 legs
    _progress("vqa bf16 legs: freeing int8 tree, rebuilding bf16 weights")
    for leaf in jax.tree.leaves(qparams):
        try:
            leaf.delete()
        except Exception:
            pass
    del qparams
    if "sparams" in dir():
        del sparams
    import gc

    gc.collect()
    params = build_params(model)
    kv_loop, prefill_loop, pair_loop, scores_once = make_legs(model)
    # each bf16 sub-leg is individually survivable: at the 13.5 GB weight
    # scale SOME graphs OOM HBM (buffer-assignment verdict surfaces as a
    # remote-compile HTTP 500 — PERF.md round 4) — partial numbers are
    # still informative
    try:
        _progress("vqa bf16: kv-reuse path compile + time")
        t_kv = timed_loop(kv_loop, params)
        bf16_scores = np.asarray(
            scores_once(params, jnp.asarray(0.0)), np.float32)
        out["vqa_bf16_fits"] = True
        out["vqa_bf16_scores_per_s"] = round(n_texts / t_kv, 2)
        out["vqa_int8_max_abs_score_diff"] = round(
            float(np.abs(q_scores - bf16_scores).max()), 4)
        if s_scores is not None:
            out["vqa_int8_static_max_abs_score_diff"] = round(
                float(np.abs(s_scores - bf16_scores).max()), 4)
    except Exception as e:
        out["vqa_bf16_fits"] = False
        out["vqa_bf16"] = _skip(
            "7B bf16 kv-reuse graph over 16 GB HBM beside the 13.5 GB "
            "weights; int8 (fits, 1.7x faster) is the serving path", e)
    if out.get("vqa_bf16_fits"):
        # the reference-shaped pair path carries ~650 MB of all-position
        # fp32 logits on top of the 13.5 GB weights — it may OOM where the
        # kv path fits; its failure is a structured skip (the knife's-edge
        # bf16 story is documented in PERF.md round 4)
        try:
            _progress("vqa bf16: reference-shaped pair path")
            t_pair = timed_loop(pair_loop, params)
            out["vqa_bf16_pair_scores_per_s"] = round(n_texts / t_pair, 2)
            out["vqa_kv_reuse_speedup"] = round(t_pair / t_kv, 2)
        except Exception as e:
            out["vqa_bf16_pair"] = _skip(
                "bf16 pair path needs ~650 MB logits beside 13.5 GB "
                "weights: over HBM on one v5e — this leg cannot run "
                "single-chip at bf16 (int8 pair leg above is the "
                "reference-shaped comparison)", e)
    if out.get("vqa_bf16_fits"):
        try:
            _progress("vqa bf16: prefill-only path")
            t_prefill = timed_loop(prefill_loop, params)
            out["vqa_bf16_prefill_tokens_per_s"] = round(
                real_f / t_prefill, 1)
        except Exception as e:
            out["vqa_bf16_prefill_unrolled"] = _skip(
                "unrolled bf16 prefill graph fails at compile-time buffer "
                "assignment beside the 13.5 GB weights (PERF.md round 4)", e)
            # scan-layout fallback: 32x smaller HLO (compiles in ~15 s),
            # same math — rebuild the weights in the stacked layout (the
            # unrolled tree is freed first; HBM cannot hold both)
            try:
                _progress("vqa bf16: scan-layout prefill fallback")
                for leaf in jax.tree.leaves(params):
                    try:
                        leaf.delete()
                    except Exception:
                        pass
                del params
                gc.collect()
                smodel_scan = Llava(cfg, dtype=jnp.bfloat16, scan_llm=True)
                params = build_params(smodel_scan)

                def scan_prefill_only(p, salt):
                    px = dev["pixels"] + salt.astype(jnp.bfloat16)
                    _, mut = smodel_scan.apply(
                        {"params": p}, dev["prefix_ids"], px,
                        dev["prefix_valid"], method="prefill",
                        mutable=["kv"],
                    )
                    leaf = jax.tree.leaves(mut["kv"])[0]
                    return leaf.ravel()[0].astype(jnp.float32)

                @jax.jit
                def scan_prefill_loop(p, salt0, iters):
                    def body(_, salt):
                        return scan_prefill_only(p, salt) * 1e-6
                    return jax.lax.fori_loop(0, iters, body, salt0)

                t_prefill = timed_loop(scan_prefill_loop, params)
                out["vqa_bf16_prefill_tokens_per_s"] = round(
                    real_f / t_prefill, 1)
                out["vqa_bf16_prefill_layout"] = "scan"
            except Exception as e2:
                out["vqa_bf16_prefill"] = _skip(
                    "bf16 7B prefill cannot run on one 16 GB v5e in either "
                    "trunk layout; int8 prefill (above) is the single-chip "
                    "path", e2)
    return out


def _build_random_device_params(jax, jnp, model, example_args):
    """Random params at full shape, generated ON DEVICE (a host build +
    device_put of a multi-GB tree over the axon tunnel is minutes-slow).
    2-d+ float leaves ~ N(0, 0.02); 1-d/scalar float leaves (norm gains,
    biases) = 1; int8 leaves (pre-quantized trees) ~ uniform int8 with
    'scale' leaves at 0.02/127 so dequantized magnitudes match the float
    convention. Timing-only weights (zero egress): shape-determined."""
    shapes = jax.eval_shape(
        lambda k: model.init(k, *example_args)["params"],
        jax.random.PRNGKey(0),
    )
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    names = [str(getattr(p[-1], "key", p[-1])) for p, _ in flat]
    leaves = [leaf for _, leaf in flat]

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, len(leaves))
        out = []
        for k, name, leaf in zip(ks, names, leaves):
            if leaf.dtype == jnp.int8:
                out.append(jax.random.randint(
                    k, leaf.shape, -127, 128, jnp.int32).astype(jnp.int8))
            elif name == "scale":
                out.append(jnp.full(leaf.shape, 0.02 / 127.0, jnp.float32))
            elif name == "act_scale":
                out.append(jnp.full(leaf.shape, 0.02, jnp.float32))
            elif len(leaf.shape) >= 2:
                out.append(
                    jax.random.normal(k, leaf.shape, jnp.bfloat16) * 0.02)
            else:
                out.append(jnp.ones(leaf.shape, jnp.bfloat16))
        return out

    return jax.tree.unflatten(treedef, mk(jax.random.PRNGKey(1)))


def _timed_loop_generic(jax, jnp, loop, p, iters=4):
    """Long-minus-short fori_loop timing (constant dispatch cancels)."""
    import time as _t

    float(loop(p, jnp.asarray(1e-6), 1))
    float(loop(p, jnp.asarray(1e-6), iters))
    t0 = _t.perf_counter(); float(loop(p, jnp.asarray(1e-6), 1))
    ts = _t.perf_counter() - t0
    t0 = _t.perf_counter(); float(loop(p, jnp.asarray(1e-6), iters))
    tl = _t.perf_counter() - t0
    return max(tl - ts, 0.1 * tl) / (iters - 1)


def _bench_t5(jax, jnp, np):
    """CLIP-FlanT5 VQAScore serving leg — the REFERENCE'S DEFAULT VQAScore
    backbone (t2v_metrics/vqascore.py:11 defaults to clip-flant5-xxl).

    TPU-first split (scores/vqa_score.py T5VQAScorer): the CLIP tower +
    projector output is text-independent, so the m x n broadcast encodes
    each image ONCE and splices cached features into the n per-text encoder
    inputs; the reference re-runs the full vision tower per (image, text)
    pair (clip_t5_model.py:220-281). The T5 encoder is bidirectional, so
    unlike LLaVA there is no KV-prefix trick — the speedup is vision-reuse
    + full pair batching.

    Fit story: xl (3B) fits bf16 (~6.3 GB); xxl (11B) bf16 is ~22 GB —
    UNSERVABLE on one 16 GB v5e — but W8A8 (~11.2 GB) fits: int8 isn't
    just speed here, it is what makes the reference's default model
    single-chip servable at all."""
    import os
    import time as _t

    from clip_embeds_tpu.core.config import VisionConfig
    from clip_embeds_tpu.models.clip_t5 import CLIPT5, CLIPT5Config
    from clip_embeds_tpu.models.llava import IMAGE_TOKEN_INDEX
    from clip_embeds_tpu.models.quant import (
        T5_QUANT_LAYER_NAMES,
        quantize_tree_on_device,
    )
    from clip_embeds_tpu.models.t5 import T5Config

    tiny = bool(os.environ.get("BENCH_VQA_TINY"))
    if tiny:
        cfg = CLIPT5Config(
            t5=T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                        num_layers=2, num_heads=4),
            vision=VisionConfig(image_size=32, patch_size=16, width=64,
                                layers=2, head_width=32),
        )
    else:
        # flan-t5-xl: 24+24 layers, d_model 2048 (scores/build.py _flant5_cfg)
        cfg = CLIPT5Config(t5=T5Config(d_model=2048, d_ff=5120,
                                       num_layers=24, num_heads=32))

    k_grp, n_texts = 4, 8
    q_len, a_len = 48, 4
    q_pad, a_pad = 64, 8
    img_size = cfg.vision.image_size
    hi_tok = min(31000, cfg.t5.vocab_size - 1)
    rng = np.random.default_rng(5)

    # one sentinel per row at a realistic chat-template position
    ids = np.full((k_grp * n_texts, q_pad), cfg.pad_id, np.int32)
    enc_mask = np.zeros((k_grp * n_texts, q_pad), bool)
    for r in range(k_grp * n_texts):
        ids[r, :q_len] = rng.integers(2, hi_tok, q_len)
        ids[r, 20] = IMAGE_TOKEN_INDEX
        enc_mask[r, :q_len] = True
    labels = np.full((k_grp * n_texts, a_pad), -100, np.int32)
    labels[:, :a_len] = rng.integers(2, hi_tok, (k_grp * n_texts, a_len))
    dec_mask = np.zeros((k_grp * n_texts, a_pad), bool)
    dec_mask[:, :a_len] = True
    img_idx = np.repeat(np.arange(k_grp), n_texts)

    dev = {
        "ids": jnp.asarray(ids),
        "enc_mask": jnp.asarray(enc_mask),
        "labels": jnp.asarray(labels),
        "dec_mask": jnp.asarray(dec_mask),
        "img_idx": jnp.asarray(img_idx.astype(np.int32)),
        "pixels": jnp.asarray(
            rng.standard_normal((k_grp, img_size, img_size, 3)),
            jnp.bfloat16),
    }

    def ce_scores(logits, labels_):
        logits = logits.astype(jnp.float32)
        valid = labels_ != -100
        safe = jnp.where(valid, labels_, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(
            logits, safe[..., None], axis=-1)[..., 0]
        ce = (logz - picked) * valid
        return jnp.exp(-ce.sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1))

    def make_legs(model):
        def feats_scores(p, salt):
            px = dev["pixels"] + salt.astype(jnp.bfloat16)
            feats = model.apply({"params": p}, px, method="encode_images")
            logits = model.apply(
                {"params": p}, dev["ids"], feats[dev["img_idx"]],
                dev["labels"], dev["enc_mask"], dev["dec_mask"],
                method="forward_with_features",
            )
            return ce_scores(logits, dev["labels"])

        def pair_scores(p, salt):
            # reference-shaped: the vision tower re-runs per (image, text)
            px = (dev["pixels"] + salt.astype(jnp.bfloat16))[dev["img_idx"]]
            logits = model.apply(
                {"params": p}, dev["ids"], px, dev["labels"],
                dev["enc_mask"], dev["dec_mask"],
            )
            return ce_scores(logits, dev["labels"])

        def as_loop(fn):
            @jax.jit
            def loop(p, salt0, iters):
                def body(_, salt):
                    return jnp.sum(fn(p, salt)) * 1e-6
                return jax.lax.fori_loop(0, iters, body, salt0)
            return loop

        return (as_loop(feats_scores), as_loop(pair_scores),
                jax.jit(feats_scores), jax.jit(pair_scores))

    out = {}
    n_pairs = k_grp * n_texts

    _progress("t5 xl: building bf16 params on device")
    model = CLIPT5(cfg, dtype=jnp.bfloat16)
    init_args = (
        jnp.asarray(ids[:1]),
        jnp.zeros((1, img_size, img_size, 3), jnp.bfloat16),
        jnp.asarray(labels[:1]),
    )
    params = _build_random_device_params(jax, jnp, model, init_args)

    feats_loop, pair_loop, feats_once, pair_once = make_legs(model)
    bf16_scores = None
    try:
        _progress("t5 xl bf16: feature-reuse m x n path compile + time")
        t_feats = _timed_loop_generic(jax, jnp, feats_loop, params)
        out["t5_xl_bf16_scores_per_s"] = round(n_pairs / t_feats, 2)
        bf16_scores = np.asarray(
            feats_once(params, jnp.asarray(0.0)), np.float32)
        _progress("t5 xl bf16: reference-shaped pair path")
        t_pair = _timed_loop_generic(jax, jnp, pair_loop, params)
        out["t5_xl_bf16_pair_scores_per_s"] = round(n_pairs / t_pair, 2)
        out["t5_xl_bf16_feats_reuse_speedup"] = round(t_pair / t_feats, 2)
        pair_sc = np.asarray(
            pair_once(params, jnp.asarray(0.0)), np.float32)
        out["t5_xl_feats_vs_pair_max_diff"] = round(
            float(np.abs(bf16_scores - pair_sc).max()), 4)
    except Exception as e:
        out["t5_xl_bf16"] = _skip(
            "bf16 xl leg failed on this chip", e)

    # W8A8 trunk: quantize the same weights in place (leaf-by-leaf, int8
    # replaces bf16 so peak HBM stays ~6.3 GB + one leaf)
    try:
        _progress("t5 xl int8: quantizing T5 trunk on device")
        qparams = dict(params)
        qparams["t5"] = quantize_tree_on_device(
            params["t5"], T5_QUANT_LAYER_NAMES, free_source=True)
        del params
        qmodel = CLIPT5(cfg, dtype=jnp.bfloat16, quant_t5="dynamic")
        qf_loop, qp_loop, qf_once, _ = make_legs(qmodel)
        _progress("t5 xl int8: feature-reuse m x n path compile + time")
        t_feats_q = _timed_loop_generic(jax, jnp, qf_loop, qparams)
        out["t5_xl_int8_scores_per_s"] = round(n_pairs / t_feats_q, 2)
        _progress("t5 xl int8: reference-shaped pair path")
        t_pair_q = _timed_loop_generic(jax, jnp, qp_loop, qparams)
        out["t5_xl_int8_pair_scores_per_s"] = round(n_pairs / t_pair_q, 2)
        out["t5_xl_int8_feats_reuse_speedup"] = round(t_pair_q / t_feats_q, 2)
        if bf16_scores is not None:
            q_scores = np.asarray(
                qf_once(qparams, jnp.asarray(0.0)), np.float32)
            out["t5_xl_int8_max_abs_score_diff"] = round(
                float(np.abs(q_scores - bf16_scores).max()), 4)
        for leaf in jax.tree.leaves(qparams):
            try:
                leaf.delete()
            except Exception:
                pass
        del qparams
    except Exception as e:
        out["t5_xl_int8"] = _skip("int8 xl leg failed on this chip", e)

    # xxl — the reference's literal default. bf16 is ~22 GB: can NEVER run
    # on one 16 GB v5e chip (recorded as a structured skip, not attempted);
    # W8A8 ~11.2 GB fits. Weights are built directly in the quantized
    # layout (a 22 GB bf16 tree cannot exist on-chip to be quantized from).
    out["t5_xxl_bf16"] = _skip(
        "flan-t5-xxl bf16 weights are ~22 GB > 16 GB v5e HBM; "
        "this leg can never run single-chip — use int8 (fits) or 2-way TP")
    if not tiny:
        try:
            _progress("t5 xxl int8: building pre-quantized 11B on device")
            import gc

            gc.collect()
            xxl_cfg = CLIPT5Config(t5=T5Config(
                d_model=4096, d_ff=10240, num_layers=24, num_heads=64))
            xmodel = CLIPT5(xxl_cfg, dtype=jnp.bfloat16, quant_t5="dynamic")
            xparams = _build_random_device_params(
                jax, jnp, xmodel, init_args)
            xf_loop, xp_loop, _, _ = make_legs(xmodel)
            _progress("t5 xxl int8: feature-reuse m x n path compile + time")
            t_feats_x = _timed_loop_generic(jax, jnp, xf_loop, xparams)
            out["t5_xxl_int8_fits"] = True
            out["t5_xxl_int8_scores_per_s"] = round(n_pairs / t_feats_x, 2)
            _progress("t5 xxl int8: reference-shaped pair path")
            t_pair_x = _timed_loop_generic(jax, jnp, xp_loop, xparams)
            out["t5_xxl_int8_pair_scores_per_s"] = round(
                n_pairs / t_pair_x, 2)
            out["t5_xxl_int8_feats_reuse_speedup"] = round(
                t_pair_x / t_feats_x, 2)
            for leaf in jax.tree.leaves(xparams):
                try:
                    leaf.delete()
                except Exception:
                    pass
        except Exception as e:
            out["t5_xxl_int8_fits"] = False
            out["t5_xxl_int8"] = _skip(
                "11.2 GB W8A8 xxl did not run on this chip", e)
    return out


def _bench_vlm2vec(jax, jnp, np):
    """VLM2Vec over LLaVA-1.5-7B: embedding-extraction serving
    (embed_last_token — VLM2Vec/src/model.py:42-52 pooling) at int8 + bf16,
    plus the LoRA + grad-cache contrastive TRAIN step (the reference recipe,
    scripts/llava_1.5/run_train.sh: LoRA r16 over the frozen trunk, in-batch
    negatives T=0.02) — the last BASELINE config with no on-chip numbers
    (VERDICT r4 Weak #3/#4).

    Memory plan: train runs bf16 base + remat'd trunk + grad-cache chunks
    (only LoRA params take grads/optimizer state, so the 13.5 GB base +
    ~0.2 GB chunk activations is the knife's-edge bf16 budget); serving
    quantizes the trunk W8A8 (~6.9 GB) for robust single-chip headroom."""
    import os
    import time as _t

    from clip_embeds_tpu.models.llava import (
        IMAGE_TOKEN_INDEX,
        Llava,
        LlavaConfig,
        llava_tiny_config,
    )
    from clip_embeds_tpu.models.quant import (
        LLAMA_QUANT_LAYER_NAMES,
        quantize_tree_on_device,
    )

    tiny = bool(os.environ.get("BENCH_VQA_TINY"))
    cfg = llava_tiny_config() if tiny else LlavaConfig()
    img_size = cfg.vision.image_size
    hi_tok = min(31000, cfg.llama.vocab_size - 1)
    B, Lq, Lt = 8, 80, 64  # qry: 79 text + sentinel -> 655-token sequence
    rng = np.random.default_rng(11)
    qry_ids = rng.integers(2, hi_tok, (B, Lq)).astype(np.int32)
    qry_ids[:, 0] = 1
    qry_ids[:, 20] = IMAGE_TOKEN_INDEX
    tgt_ids = rng.integers(2, hi_tok, (B, Lt)).astype(np.int32)
    tgt_ids[:, 0] = 1
    dev = {
        "qry_ids": jnp.asarray(qry_ids),
        "qry_mask": jnp.ones((B, Lq), bool),
        "qry_pixels": jnp.asarray(
            rng.standard_normal((B, img_size, img_size, 3)), jnp.bfloat16),
        "tgt_ids": jnp.asarray(tgt_ids),
        "tgt_mask": jnp.ones((B, Lt), bool),
    }

    def make_embed_loop(model):
        def embed(p, salt):
            px = dev["qry_pixels"] + salt.astype(jnp.bfloat16)
            return model.apply(
                {"params": p}, dev["qry_ids"], px, dev["qry_mask"],
                method="embed_last_token",
            )

        @jax.jit
        def loop(p, salt0, iters):
            def body(_, salt):
                return jnp.sum(embed(p, salt)) * 1e-6
            return jax.lax.fori_loop(0, iters, body, salt0)
        return loop

    out = {}
    model = Llava(cfg, dtype=jnp.bfloat16)
    _progress("vlm2vec: building 7B bf16 params on device")
    init_args = (
        jnp.asarray(qry_ids[:1]),
        jnp.zeros((1, img_size, img_size, 3), jnp.bfloat16),
    )
    params = _build_random_device_params(jax, jnp, model, init_args)

    # -- embedding-extraction serving (bf16, while the tree is fresh) -------
    try:
        _progress("vlm2vec bf16: embed_last_token compile + time")
        t_emb = _timed_loop_generic(jax, jnp, make_embed_loop(model), params)
        out["vlm2vec_bf16_embed_per_s"] = round(B / t_emb, 2)
    except Exception as e:
        out["vlm2vec_bf16_embed"] = _skip(
            "13.5 GB bf16 trunk + embed graph over HBM; int8 is the "
            "single-chip serving path", e)

    # The materialize()-mode bf16 LoRA train step can NEVER run single-chip:
    # materialize builds delta-added copies of every targeted kernel
    # (q/k/v/o/gate/up/down x 32 layers ~ 12.5 GB) beside the 13.5 GB base
    # — ~26 GB against 16 GB HBM. Recorded as a structured skip, not
    # attempted; the unmaterialized QLoRA-shaped step (below) is the
    # single-chip training path.
    out["vlm2vec_train_bf16_materialized"] = _skip(
        "bf16 base (13.5 GB) + materialize()'d delta kernels (~12.5 GB) "
        "~ 26 GB > 16 GB v5e HBM; can never run single-chip — the "
        "unmaterialized int8-base step is the single-chip recipe")

    try:
        _progress("vlm2vec int8: quantizing trunk on device")
        lm = dict(params["language_model"])
        lm["model"] = quantize_tree_on_device(
            lm["model"], LLAMA_QUANT_LAYER_NAMES, free_source=True)
        qparams = dict(params, language_model=lm)
        del params
        qmodel = Llava(cfg, dtype=jnp.bfloat16, quant_llm="dynamic")
        _progress("vlm2vec int8: embed_last_token compile + time")
        t_emb_q = _timed_loop_generic(
            jax, jnp, make_embed_loop(qmodel), qparams)
        out["vlm2vec_int8_embed_per_s"] = round(B / t_emb_q, 2)
    except Exception as e:
        out["vlm2vec_int8_embed"] = _skip("int8 embed leg failed", e)
        return out

    # -- QLoRA-shaped train step: frozen W8A8 trunk + unmaterialized LoRA ---
    # (models/quant.py _lora_delta via the 'lora' collection): the base
    # kernels are never rewritten, so the whole step is ~6.9 GB weights +
    # fp32 r16 adapters (~0.4 GB) + remat'd grad-cache chunk activations.
    # Exactness vs the materialize() step is pinned in
    # tests/test_vlm2vec.py::test_unmaterialized_train_step_matches_materialized.
    try:
        _progress("vlm2vec train: unmaterialized LoRA over int8 trunk")
        import optax

        from clip_embeds_tpu.models.lora import init_lora
        from clip_embeds_tpu.train.steps import TrainState
        from clip_embeds_tpu.train.vlm2vec import make_vlm2vec_train_step

        train_model = Llava(cfg, dtype=jnp.bfloat16, remat=True,
                            quant_llm="dynamic", lora_rank=16,
                            lora_alpha=16.0)
        lora = init_lora(qparams, rank=16)
        state = TrainState.create(lora, optax.adamw(1e-4))
        step = jax.jit(make_vlm2vec_train_step(
            train_model, qparams, lora_alpha=16.0, temperature=0.02,
            grad_cache_chunks=4,
        ))
        batch = dict(dev)
        state2, metrics = step(state, batch)
        float(metrics["loss"])  # force compile + first step
        t0 = _t.perf_counter()
        state2, metrics = step(state2, batch)
        float(metrics["loss"])
        t1 = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        for _ in range(3):
            state2, metrics = step(state2, batch)
        float(metrics["loss"])
        t3 = _t.perf_counter() - t0
        t_step = max((t3 - t1) / 2, 0.1 * t3 / 3)
        out["vlm2vec_train_samples_per_s"] = round(B / t_step, 2)
        out["vlm2vec_train_shape"] = (
            f"bs{B} lora_r16 gc_chunks4 qry{Lq}+img tgt{Lt} "
            "int8-trunk+unmaterialized-lora+remat")
        del state, state2, step, lora
    except Exception as e:
        out["vlm2vec_train"] = _skip(
            "unmaterialized-LoRA int8-trunk grad-cache train step did not "
            "fit/compile on one 16 GB v5e; multi-chip FSDP/TP shards it "
            "(dryrun-certified)", e)

    for leaf in jax.tree.leaves(qparams):
        try:
            leaf.delete()
        except Exception:
            pass
    return out


def _bench_qwen2vl(jax, jnp, np):
    """Qwen2-VL-7B embed_last_token serving — the first non-LLaVA VLM
    backbone with an on-chip number (VERDICT r4 Next #6). The Qwen2-7B
    trunk is ~15.2 GB bf16 (recorded as a structured skip: it can never
    run single-chip) vs ~6.7 GB W8A8 beside the bf16 vision tower and the
    untied 152k-vocab embed + lm_head (~2.2 GB) — int8 makes it servable.
    Shapes: 448x448 image -> (1,32,32) grid -> 256 merged tokens + 64 text
    (M-RoPE positions [B, 3, L])."""
    import os

    from clip_embeds_tpu.models.llama import LlamaConfig
    from clip_embeds_tpu.models.qwen2_vl import (
        Qwen2VL,
        Qwen2VLConfig,
        Qwen2VLVisionConfig,
    )

    tiny = bool(os.environ.get("BENCH_VQA_TINY"))
    if tiny:
        cfg = Qwen2VLConfig(
            text=LlamaConfig(vocab_size=256, hidden_size=64,
                             intermediate_size=128, num_layers=2,
                             num_heads=4, num_kv_heads=2,
                             mrope_section=(2, 3, 3), attention_bias=True),
            vision=Qwen2VLVisionConfig(depth=2, embed_dim=64, hidden_size=64,
                                       num_heads=4),
        )
        grid = (1, 4, 4)
    else:
        cfg = Qwen2VLConfig()  # 7B: 28L x 3584 GQA trunk + 32L ViT-bigG-ish
        grid = (1, 32, 32)

    t, h, w = grid
    n_patches = t * h * w
    m2 = cfg.vision.spatial_merge_size ** 2
    n_img_tok = n_patches // m2
    B, n_text = 4, 64
    L = n_img_tok + n_text
    rng = np.random.default_rng(13)
    hi_tok = min(31000, cfg.text.vocab_size - 1)
    ids = rng.integers(2, hi_tok, (B, L)).astype(np.int32)
    ids[:, 1 : 1 + n_img_tok] = cfg.image_token_id
    patches = rng.standard_normal(
        (B, n_patches, cfg.vision.patch_dim)).astype(np.float32)
    positions = np.broadcast_to(
        np.arange(L, dtype=np.int32)[None, None, :], (B, 3, L)).copy()

    dev = {
        "ids": jnp.asarray(ids),
        "patches": jnp.asarray(patches, jnp.bfloat16),
        "mask": jnp.ones((B, L), bool),
        "positions": jnp.asarray(positions),
    }

    def make_embed_loop(model):
        def embed(p, salt):
            px = dev["patches"] + salt.astype(jnp.bfloat16)
            return model.apply(
                {"params": p}, dev["ids"], px, grid, dev["mask"],
                dev["positions"], method="embed_last_token",
            )

        @jax.jit
        def loop(p, salt0, iters):
            def body(_, salt):
                return jnp.sum(embed(p, salt)) * 1e-6
            return jax.lax.fori_loop(0, iters, body, salt0)
        return loop

    out = {
        "qwen2vl_bf16": _skip(
            "Qwen2-VL-7B bf16 weights are ~17 GB (15.2 trunk + untied "
            "embed/head + vision) > 16 GB v5e HBM; can never run "
            "single-chip — W8A8 (below) or 2-way TP are the serving paths"),
    }
    try:
        # the full bf16 tree cannot exist on-chip to be quantized from, so
        # the weights are built directly in the W8A8 layout (random int8 +
        # matched scales — timing-only, like every bench weight here)
        _progress("qwen2vl int8: building pre-quantized 7B on device")
        qmodel = Qwen2VL(cfg, dtype=jnp.bfloat16, quant_llm="dynamic")
        init_args = (dev["ids"][:1], dev["patches"][:1], grid)
        qparams = _build_random_device_params(jax, jnp, qmodel, init_args)
        _progress("qwen2vl int8: embed_last_token compile + time")
        t_emb = _timed_loop_generic(
            jax, jnp, make_embed_loop(qmodel), qparams)
        out["qwen2vl_int8_embed_per_s"] = round(B / t_emb, 2)
        out["qwen2vl_shape"] = f"grid{grid} {n_img_tok}img+{n_text}txt bs{B}"
        for leaf in jax.tree.leaves(qparams):
            try:
                leaf.delete()
            except Exception:
                pass
    except Exception as e:
        out["qwen2vl_int8"] = _skip("int8 Qwen2-VL leg failed", e)
    return out


if __name__ == "__main__":
    main()
