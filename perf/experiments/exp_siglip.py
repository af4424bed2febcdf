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

    outs = {}
    for name, encode in (("composable", composable), ("fused", fused)):
        loop = make_loop(encode)
        float(loop(params, raw, 1))
        float(loop(params, raw, 10))
        t0 = time.perf_counter(); float(loop(params, raw, 1))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(params, raw, 10))
        t_l = time.perf_counter() - t0
        per = (t_l - t_s) / 9
        print(f"{name}: {batch / per:,.1f} img/s/chip "
              f"({per * 1e3:.0f} ms/batch-{batch})", flush=True)
        outs[name] = np.asarray(jax.jit(encode)(
            params, raw, jnp.asarray(0.0)), np.float32)
    cos = float((outs["composable"] * outs["fused"]).sum(-1).mean())
    print("cos fused vs composable:", round(cos, 5))


if __name__ == "__main__":
    main()
