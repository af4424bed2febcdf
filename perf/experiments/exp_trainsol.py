"""Round-4 training-path speed-of-light accounting (VERDICT r3 weak-item 2).

The serving path earned its headline with a checkable SOL table; the train
step's "~74 ceiling" was only remat-relative. This experiment produces the
chip-relative account: the measured fused-train step decomposed into
(forward, backward+recompute, optimizer) against matmul-FLOP floors at the
chip's measured bf16 rate.

Components measured on the real chip (ViT-L/14-336, bs 32, bf16 compute /
fp32 params, fused-train recipe = round-3 best):

  fwdonly — jitted loss value (fused forward + InfoNCE), no grad
  fwdbwd  — value_and_grad step with optax.set_to_zero (no optimizer math)
  full    — AdamW step (production)

  backward+recompute = fwdbwd - fwdonly;  optimizer = full - fwdbwd

SOL arithmetic (printed): per-sample matmul FLOPs of both towers,
  fwd = 2*MAC, dgrad+wgrad = 2x fwd, VJP recompute = +1 fwd
at the measured standalone bf16 matmul rate (159 TFLOP/s, round-1
exp_layout) and at the 197 chip peak.

Run: python perf/experiments/exp_trainsol.py [variants...]
Variants: fwdonly fwdbwd full (suffix _bs48 for batch 48; _res for the
round-4 residual backward, e.g. full_res fwdbwd_res)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

BF16_MEASURED = 159e12   # standalone large-matmul rate on this chip
BF16_PEAK = 197e12


def tower_macs_per_sample():
    """(image_tower, text_tower) matmul MACs per sample, forward pass."""
    def tower(n, d, layers, mlp_ratio=4):
        proj = n * d * d * (4 + 2 * mlp_ratio)     # qkv+out + MLP pair
        attn = 2 * n * n * d                       # QK^T + PV
        return layers * (proj + attn)

    img = tower(577, 1024, 24)
    txt = tower(77, 768, 12)
    return img, txt


def sol_table(measured_ms=None):
    img, txt = tower_macs_per_sample()
    fwd_flops = 2 * (img + txt)
    bwd_flops = 2 * fwd_flops      # dgrad + wgrad
    rec_flops = fwd_flops          # custom-VJP recompute of the block fwd
    print("\n-- train-step SOL (per sample, matmul FLOPs only) --")
    print(f"fwd  {fwd_flops/1e9:7.1f} GFLOP | bwd {bwd_flops/1e9:7.1f} | "
          f"recompute {rec_flops/1e9:7.1f} | total "
          f"{(fwd_flops+bwd_flops+rec_flops)/1e9:7.1f}")
    for label, rate in (("measured-rate floor", BF16_MEASURED),
                        ("chip peak", BF16_PEAK)):
        t_fwd = fwd_flops / rate * 1e3
        t_bwd = bwd_flops / rate * 1e3
        t_rec = rec_flops / rate * 1e3
        tot = t_fwd + t_bwd + t_rec
        print(f"{label:20s}: fwd {t_fwd:5.2f} ms  bwd {t_bwd:5.2f}  "
              f"recompute {t_rec:5.2f}  total {tot:5.2f} ms/sample "
              f"-> {1e3/tot:6.1f} samples/s (with recompute), "
              f"{1e3/(t_fwd+t_bwd):6.1f} (zero-recompute)")
    if measured_ms:
        print(f"measured components (ms/step @ bs32): {measured_ms}")


def build(batch_size: int, block_impl: str = "fused-train"):
    from clip_embeds_tpu.core.factory import create_model
    from clip_embeds_tpu.models.clip import CLIP
    from clip_embeds_tpu.losses.clip_loss import clip_loss

    base, params = create_model("ViT-L-14-336", pretrained="openai")
    model = CLIP(base.cfg, dtype=jnp.bfloat16, block_impl=block_impl)
    rng = np.random.default_rng(0)
    batch = jax.device_put({
        "images": jnp.asarray(
            rng.standard_normal((batch_size, 336, 336, 3)), jnp.bfloat16),
        "texts": jnp.asarray(
            rng.integers(1, 49000, (batch_size, 77)), jnp.int32),
    })
    return model, jax.device_put(params), batch


def bench_variant(name: str):
    import optax

    from clip_embeds_tpu.train.optim import adamw
    from clip_embeds_tpu.train.steps import TrainState, make_clip_train_step
    from clip_embeds_tpu.losses.clip_loss import clip_loss

    batch_size = 48 if name.endswith("bs48") else 32
    block_impl = "fused-train-res" if "res" in name.split("_")[1:] \
        else "fused-train"
    model, params, batch = build(batch_size, block_impl)
    base = name.split("_")[0]

    if base == "fwdonly":
        @jax.jit
        def fwd(p, b):
            out = model.apply({"params": p}, b["images"], b["texts"])
            return clip_loss(out["image_features"], out["text_features"],
                             out["logit_scale"])

        # back-to-back dispatch loop with one forcing fetch
        fwd(params, batch)
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fwd(params, batch)
            assert np.isfinite(float(out))
            return time.perf_counter() - t0
        run(2)
        ts, tl = run(3), run(15)
        per = (tl - ts) / 12
    else:
        if base == "fwdbwd":
            # NOT set_to_zero: zero updates make the grads dead code and
            # XLA deletes the entire backward (measured: fwdbwd == fwdonly).
            # A tiny non-foldable scale keeps the backward live at ~zero
            # optimizer cost (one scaled add per param).
            tx = optax.scale(-1e-30)
        elif "bf16mu" in name:
            # halve the first-moment HBM traffic (round-2 bf16mu finding)
            tx = adamw(1e-4, mu_dtype=jnp.bfloat16)
        else:
            tx = adamw(1e-4)
        state = TrainState.create(params, tx)
        step = jax.jit(make_clip_train_step(model), donate_argnums=0)
        state, metrics = step(state, batch)
        float(metrics["loss"])
        def run(n):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = step(state, batch)
            assert np.isfinite(float(metrics["loss"]))
            return time.perf_counter() - t0
        run(2)
        ts, tl = run(3), run(15)
        per = (tl - ts) / 12

    print(f"{name:14s}: {per*1e3:7.1f} ms/step (bs {batch_size}) -> "
          f"{batch_size/per:6.1f} samples/s/chip", flush=True)
    return per


if __name__ == "__main__":
    variants = sys.argv[1:] or ["fwdonly", "fwdbwd", "full"]
    results = {}
    for v in variants:
        results[v] = bench_variant(v)
    sol_table({k: round(t * 1e3, 1) for k, t in results.items()})
    if {"fwdonly", "fwdbwd", "full"} <= results.keys():
        f, fb, full = (results[k] * 1e3 for k in ("fwdonly", "fwdbwd", "full"))
        print(f"\ndecomposition @ bs32: forward {f:.1f} ms | "
              f"backward+recompute {fb - f:.1f} ms | optimizer "
              f"{full - fb:.1f} ms | total {full:.1f} ms")
