"""Benchmark: ViT-L/14-336 image-embedding throughput (images/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference stack embeds images through torch CLIP ViT-L/14-336
with fp16 autocast + SDPA on an A100; public numbers put that at roughly
1000 img/s/GPU for pure encode at batch 256. The BASELINE.json target is
>= 2x that per TPU chip. vs_baseline = value / 1000.
"""

from __future__ import annotations

import json
import time

A100_BASELINE_IMG_PER_S = 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embeds_tpu.core.factory import create_model
    from clip_embeds_tpu.image.preprocess import jax_preprocess

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 8

    model, params = create_model("ViT-L-14-336", dtype=jnp.bfloat16)
    params = jax.device_put(params)

    @jax.jit
    def embed(params, raw_u8, salt):
        # fused on-device preprocess -> patchify -> encoder -> normalized embed
        # (salt varies the input per iteration so no runtime layer can dedupe
        # identical dispatches)
        images = jax_preprocess(raw_u8, 336, "clip", jnp.bfloat16)
        images = images + salt.astype(jnp.bfloat16)
        return model.apply(
            {"params": params}, images, normalize=True, method="encode_image"
        )

    import numpy as np

    raw = np.random.default_rng(0).integers(
        0, 255, (batch, 336, 336, 3), dtype=np.uint8
    )
    raw = jax.device_put(jnp.asarray(raw))

    # Warmup/compile. NOTE: under the axon remote platform block_until_ready
    # returns immediately; only a host fetch forces execution. So we (a) force
    # the warmup with a fetch, (b) chain iterations through a data dependency,
    # and (c) force the whole chain with one final fetch.
    float(embed(params, raw, jnp.asarray(0.0))[0, 0])

    iters = 20 if on_tpu else 2
    salt = jnp.asarray(1e-6)
    start = time.perf_counter()
    for _ in range(iters):
        out = embed(params, raw, salt)
        salt = out[0, 0].astype(jnp.float32) * 1e-6  # chain: no dedup, no overlap skew
    float(salt)  # forces the full chain
    elapsed = time.perf_counter() - start

    img_per_s = batch * iters / elapsed
    print(json.dumps({
        "metric": "vit_l14_336_embed_images_per_sec_per_chip",
        "value": round(img_per_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / A100_BASELINE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
