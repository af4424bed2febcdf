import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.core.factory import init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP
from clip_embeds_tpu.train.optim import adamw
from clip_embeds_tpu.train.schedules import cosine_lr
from clip_embeds_tpu.train.steps import TrainState, make_clip_train_step

cfg = get_model_config("ViT-L-14-336", pretrained="openai")
batch = 64
model = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash", remat=True)
params = init_params(model, cfg)
tx = adamw(cosine_lr(1e-5, 100, 1000))
state = TrainState.create(params, tx)
step = make_clip_train_step(model)

r = np.random.default_rng(0)
images = jnp.asarray(r.standard_normal((batch,336,336,3)).astype(np.float32), jnp.bfloat16)
texts = jnp.asarray(r.integers(1, 49000, (batch, 77)), jnp.int32)

@jax.jit
def loop(state, images, texts, n):
    def body(_, s):
        s2, m = step(s, {"images": images + m0(s), "texts": texts})
        return s2
    def m0(s):
        return (s.step.astype(jnp.bfloat16) * 1e-9)
    return jax.lax.fori_loop(0, n, body, state)

import functools
loop = jax.jit(loop, static_argnums=3, donate_argnums=0)
state = loop(state, images, texts, 1)
float(state.params["logit_scale"])  # force
t0 = time.perf_counter(); state = loop(state, images, texts, 1); float(state.params["logit_scale"]); t1 = time.perf_counter()-t0
t0 = time.perf_counter(); state = loop(state, images, texts, 6); float(state.params["logit_scale"]); tn = time.perf_counter()-t0
dt = (tn - t1) / 5
print(f"train step (bs={batch}, remat, bf16): {dt*1e3:.0f} ms -> {batch/dt:.1f} samples/s/chip", flush=True)
