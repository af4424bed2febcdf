"""Round-2 training-path measurement: full donated-state CLIP train step.

Round 1: 51.8 samples/s/chip for the production per-dispatch loop
(ViT-L/14-336, batch 64, remat, bf16 compute / fp32 params) —
allocator-pressure-bound: fp32 params+mu+nu = 5.1 GB of 15 GB HBM plus
donated in/out and remat buffers. Variants:

  fp32mu — reproduce the round-1 configuration
  bf16mu — adamw(mu_dtype=bfloat16): -0.85 GB of optimizer state

Timing: dispatch N donated steps back-to-back (no intermediate fetches),
force with one final loss fetch; long-minus-short differencing removes the
constant fetch cost. Per-step dispatch latency is linear in N on both sides
and at >1 s/step compute it is noise.

Run: python perf/experiments/exp_trainstep.py [fp32mu bf16mu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
BATCH_SMALL = 32


def bench_variant(name: str):
    import optax

    from clip_embeds_tpu.core.factory import create_model
    from clip_embeds_tpu.models.clip import CLIP
    from clip_embeds_tpu.train.optim import adamw
    from clip_embeds_tpu.train.steps import TrainState, make_clip_train_step

    base, params = create_model("ViT-L-14-336", pretrained="openai")
    remat = not name.startswith("noremat")
    if "dots" in name:
        # dots_with_no_batch_dims_saveable: matmul outputs stay resident,
        # only elementwise/LN/softmax recompute in the backward pass
        remat = "dots"
    elif "attn" in name:
        # save_only_these_names('attn_out'): per-block attention outputs
        # resident (~77 MB/layer bf16), the rest recomputes
        remat = "attn"
    # explicit 'bs32' suffix only ('32' alone would match 'fp32mu')
    batch_size = BATCH_SMALL if name.endswith("bs32") else BATCH
    block_impl = "composable"
    if "fusedtrain" in name:
        # round-3: fused Pallas forward + custom-VJP composable backward
        # (ops/fused_block_ad.py) — remat is subsumed by the custom VJP
        block_impl = "fused-train"
        remat = False
    model = CLIP(base.cfg, dtype=jnp.bfloat16, remat=remat,
                 block_impl=block_impl)
    if name == "sgd":
        tx = optax.sgd(1e-4)
    elif name == "fwdbwd":
        tx = optax.set_to_zero()  # isolates forward+backward+grad cost
    else:
        mu_dtype = jnp.bfloat16 if name == "bf16mu" else None
        tx = adamw(1e-4, mu_dtype=mu_dtype)
    state = TrainState.create(jax.device_put(params), tx)
    step = jax.jit(make_clip_train_step(model), donate_argnums=0)

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((batch_size, 336, 336, 3)), jnp.bfloat16),
        "texts": jnp.asarray(
            rng.integers(1, 49000, (batch_size, 77)), jnp.int32),
    }
    batch = jax.device_put(batch)

    state, metrics = step(state, batch)     # compile + warm
    float(metrics["loss"])

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch)
        loss = float(metrics["loss"])       # forces the chain
        assert np.isfinite(loss)
        return time.perf_counter() - t0

    run(2)                                  # settle
    t_short = run(3)
    t_long = run(15)
    per = (t_long - t_short) / 12
    print(f"{name:12s}: {per * 1000:7.1f} ms/step (bs {batch_size}) -> "
          f"{batch_size / per:6.1f} samples/s/chip", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["fp32mu", "bf16mu"]):
        bench_variant(v)
