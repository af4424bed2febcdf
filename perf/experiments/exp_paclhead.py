"""Round-3: PACL head-training throughput — frozen-tower route comparison.

The PACL/SPARC recipe trains tiny projection heads over a FROZEN ViT-L
tower (reference train_pacl.py; tower under stop_gradient here). The tower
forward dominates the step, and being gradient-free it can run through the
fused serving kernels (cli/train_pacl.py --frozen-tower). This measures the
full head-training step (tower fwd -> head fwd/bwd -> Adam on the heads) at
ViT-L/14-336 on the real chip for each route:

  composable — round-2 behavior (model.apply output_tokens taps)
  fused      — bf16 fused whole-block kernels (output_tokens variant)
  int8       — W8A8 fused kernels, static scales calibrated on the batch

Run: python perf/experiments/exp_paclhead.py [route ...] [bs<batch>]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from clip_embeds_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

BATCH = 64


def build(route: str, batch: int):
    import optax

    from clip_embeds_tpu.core.factory import create_model
    from clip_embeds_tpu.losses.clip_loss import pacl_clip_loss
    from clip_embeds_tpu.models.heads import PACLHead
    from clip_embeds_tpu.train.steps import TrainState, \
        make_frozen_tower_train_step

    model, params = create_model("ViT-L-14-336", pretrained="openai",
                                 dtype=jnp.bfloat16)
    params = jax.device_put(params)
    head = PACLHead(proj_dim=768, pooling="weighted", dtype=jnp.float32)

    rng = np.random.default_rng(0)
    batch_np = {
        "images": jnp.asarray(
            rng.standard_normal((batch, 336, 336, 3)), jnp.bfloat16),
        "texts": jnp.asarray(np.concatenate([
            np.full((batch, 1), 49406),
            rng.integers(1000, 40000, (batch, 75)),
            np.full((batch, 1), 49407)], axis=1), jnp.int32),
    }
    batch_dev = jax.device_put(batch_np)

    if route == "composable":
        def feats(p, b):
            _, patches = model.apply(
                {"params": p}, b["images"], output_tokens=True,
                method="encode_image")
            txt = model.apply({"params": p}, b["texts"],
                              method="encode_text")
            return patches.astype(jnp.float32), txt.astype(jnp.float32)

        bundle = params
    else:
        from clip_embeds_tpu.models.serving import (
            fused_encode_image,
            fused_encode_image_int8,
            fused_encode_text,
            prepare_int8_tower,
        )

        qtower = None
        if route == "int8":
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                qtower = prepare_int8_tower(
                    model, jax.device_get(params),
                    jnp.asarray(np.asarray(batch_np["images"][:16],
                                           np.float32)))
        bundle = jax.device_put({"fp": jax.device_get(params),
                                 "q": jax.device_get(qtower)}
                                if qtower is not None else params)

        def feats(p, b):
            fp = p["fp"] if route == "int8" else p
            if route == "int8":
                _, patches = fused_encode_image_int8(
                    model, fp, p["q"], b["images"], normalize=False,
                    output_tokens=True)
            else:
                _, patches = fused_encode_image(
                    model, fp, b["images"], normalize=False,
                    output_tokens=True)
            txt = fused_encode_text(model, fp, b["texts"], normalize=False)
            return patches.astype(jnp.float32), txt.astype(jnp.float32)

    p0, t0 = jax.jit(feats)(bundle, batch_dev)
    head_params = head.init(jax.random.PRNGKey(0), np.asarray(p0),
                            np.asarray(t0))["params"]
    state = TrainState.create(head_params, optax.adam(1e-4))

    def loss_of(hp, f, b):
        patches, txt = f
        img_f, txt_f = head.apply(
            {"params": hp}, patches, txt, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)})
        return pacl_clip_loss(img_f, txt_f, 0.1), {}

    head_step = jax.jit(make_frozen_tower_train_step(loss_of),
                        donate_argnums=0)

    @jax.jit
    def full_step(state, bundle, b):
        f = feats(bundle, b)
        return head_step(state, f, b)

    return state, bundle, batch_dev, full_step


def bench(route: str, batch: int):
    state, bundle, batch_dev, step = build(route, batch)
    state, metrics = step(state, bundle, batch_dev)
    float(metrics["loss"])

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, bundle, batch_dev)
        assert np.isfinite(float(metrics["loss"]))
        return time.perf_counter() - t0

    run(2)
    ts = run(3)
    tl = run(15)
    per = (tl - ts) / 12
    print(f"{route:10s}: {per * 1000:7.1f} ms/step (bs {batch}) -> "
          f"{batch / per:6.1f} samples/s/chip", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    batch = BATCH
    routes = []
    for a in args:
        if a.startswith("bs"):
            batch = int(a[2:])
        else:
            routes.append(a)
    for r in routes or ["composable", "fused", "int8"]:
        try:
            bench(r, batch)
        except Exception as e:
            print(f"{r:10s}: FAILED {type(e).__name__}: {e}", flush=True)
