"""SigLIP-so400m serving: composable vs fused blocks on the real chip.

google/siglip-so400m-patch14-384 shapes (width 1152, 27 layers, heads 16,
mlp 4304, 729 tokens -> 736 pad / 768 kv). Same fori-loop differencing as
bench.py. Run: python perf/experiments/exp_siglip.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from clip_embeds_tpu.models.serving import (  # noqa: E402
    fused_encode_image_siglip,
    fused_encode_image_siglip_int8,
    prepare_int8_siglip_tower,
    siglip_fused_available,
)
from clip_embeds_tpu.models.siglip import (  # noqa: E402
    Siglip,
    SiglipConfig,
    SiglipTextConfig,
    SiglipVisionConfig,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=384, patch_size=14, width=1152,
                                  layers=27, heads=16,
                                  intermediate_size=4304),
        text=SiglipTextConfig(),
    )
    print("fused available:", siglip_fused_available(cfg.vision), flush=True)
    model = Siglip(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images0 = jnp.zeros((1, 384, 384, 3), jnp.float32)
    ids0 = jnp.zeros((1, 64), jnp.int32)
    # init on host CPU with the plain-XLA attention (pallas needs TPU)
    init_model = Siglip(cfg, dtype=jnp.float32, attn_impl="reference")
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.device_get(
            init_model.init(jax.random.PRNGKey(0), images0, ids0)["params"])
    params = jax.device_put(jax.tree.map(jnp.asarray, params))
    raw = jax.device_put(jnp.asarray(rng.integers(
        0, 255, (batch, 384, 384, 3), dtype=np.uint8)))

    def prep(raw_u8, salt):
        x = raw_u8.astype(jnp.bfloat16) / 255.0
        return (x - 0.5) / 0.5 + salt.astype(jnp.bfloat16)

    def composable(p, raw_u8, salt):
        return model.apply({"params": p}, prep(raw_u8, salt),
                           method="encode_image")

    def fused(p, raw_u8, salt):
        return fused_encode_image_siglip(model, p, prep(raw_u8, salt),
                                         normalize=True)

    def make_loop(encode):
        @jax.jit
        def loop(p, raw_u8, iters):
            def body(_, salt):
                out = encode(p, raw_u8, salt)
                return out[0, 0].astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))
        return loop

    # int8 W8A8: one-time CPU calibration (cached — the fp32 27-layer
    # observation pass on a 1-core host is minutes-slow)
    import os
    import pickle
    cache = "/root/repo/perf/.cache_siglip_int8.pkl"
    try:
        with open(cache, "rb") as f:
            qtower = pickle.load(f)
    except Exception:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            calib = np.asarray(
                prep(jnp.asarray(np.asarray(raw)[:4]), jnp.asarray(0.0)),
                np.float32)
            qtower = jax.device_get(prepare_int8_siglip_tower(
                init_model, params, jnp.asarray(calib)))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump(qtower, f)
    bundle = jax.device_put({"fp": jax.device_get(params),
                             "q": qtower})

    def fused_int8(b, raw_u8, salt):
        return fused_encode_image_siglip_int8(
            model, b["fp"], b["q"], prep(raw_u8, salt), normalize=True)

    outs = {}
    variants = (("composable", composable, params),
                ("fused", fused, params),
                ("int8", fused_int8, bundle))
    for name, encode, p in variants:
        loop = make_loop(encode)
        float(loop(p, raw, 1))
        float(loop(p, raw, 10))
        t0 = time.perf_counter(); float(loop(p, raw, 1))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(p, raw, 10))
        t_l = time.perf_counter() - t0
        per = (t_l - t_s) / 9
        print(f"{name}: {batch / per:,.1f} img/s/chip "
              f"({per * 1e3:.0f} ms/batch-{batch})", flush=True)
        outs[name] = np.asarray(jax.jit(encode)(
            p, raw, jnp.asarray(0.0)), np.float32)
    cos = float((outs["composable"] * outs["fused"]).sum(-1).mean())
    print("cos fused vs composable:", round(cos, 5))
    cos_q = float((outs["fused"] * outs["int8"]).sum(-1).mean())
    print("cos int8 vs fused bf16:", round(cos_q, 5))


if __name__ == "__main__":
    main()
