"""Text-tower serving throughput: composable vs fused bf16 vs fused int8.

The image side is measured to its floor (PERF.md); this closes the last
named lever — the W8A8 text tower (fused_block_int8 with causal attention).
ViT-L-14-336 text config: 12 layers x width 768, ctx 77 (pad 80, kv 128).

Method: same on-device fori_loop long-minus-short differencing as bench.py
(axon: block_until_ready lies, dispatch pays tunnel latency). The loop
carries an int salt that shifts the token ids each iteration so XLA cannot
hoist the computation.

Run: python perf/experiments/exp_texttower.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from clip_embeds_tpu.core.factory import create_model  # noqa: E402
from clip_embeds_tpu.models.serving import (  # noqa: E402
    fused_encode_text,
    fused_encode_text_int8,
    prepare_int8_text_tower,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    model, params = create_model("ViT-L-14-336", pretrained="openai",
                                 dtype=jnp.bfloat16)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    ctx = model.cfg.text.context_length
    base = np.concatenate([
        np.full((batch, 1), 49406),                      # SOT
        rng.integers(1000, 40000, (batch, ctx - 2)),
        np.full((batch, 1), 49407),                      # EOT (argmax pool)
    ], axis=1).astype(np.int32)
    base_ids = jax.device_put(jnp.asarray(base))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        qtower = prepare_int8_text_tower(
            model, jax.device_get(params), jnp.asarray(base[:64])
        )
    bundle = jax.device_put(
        {"fp": jax.device_get(params), "q": jax.device_get(qtower)}
    )

    def composable(p, ids):
        return model.apply({"params": p["fp"]}, ids, normalize=True,
                           method="encode_text")

    def fused_bf16(p, ids):
        return fused_encode_text(model, p["fp"], ids, normalize=True)

    def fused_int8(p, ids):
        return fused_encode_text_int8(model, p["fp"], p["q"], ids,
                                      normalize=True)

    def make_loop(encode):
        @jax.jit
        def loop(p, ids, iters):
            def body(_, salt):
                shifted = jnp.where(
                    (ids > 999) & (ids < 40000), ids + salt % 997, ids
                )
                out = encode(p, shifted)
                return salt + 1 + (out[0, 0] * 1e-6).astype(jnp.int32)
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(0, jnp.int32))
        return loop

    def time_path(name, encode, iters=30):
        loop = make_loop(encode)
        int(loop(bundle, base_ids, 1))
        int(loop(bundle, base_ids, iters))
        t0 = time.perf_counter(); int(loop(bundle, base_ids, 1))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter(); int(loop(bundle, base_ids, iters))
        t_long = time.perf_counter() - t0
        per = (t_long - t_short) / (iters - 1)
        print(f"{name}: {batch / per:,.0f} texts/s/chip "
              f"({per * 1e3:.1f} ms/batch-{batch})", flush=True)
        return encode(bundle, base_ids)

    ref = np.asarray(time_path("composable bf16", composable), np.float32)
    f16 = np.asarray(time_path("fused bf16", fused_bf16), np.float32)
    q8 = np.asarray(time_path("fused int8 W8A8", fused_int8), np.float32)
    print("cos fused-bf16 vs composable:", float((ref * f16).sum(-1).mean()))
    print("cos int8 vs fused-bf16:", float((f16 * q8).sum(-1).mean()))


if __name__ == "__main__":
    main()
