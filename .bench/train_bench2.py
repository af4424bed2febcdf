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
state = TrainState.create(params, adamw(cosine_lr(1e-5, 100, 1000)))
del params
step = jax.jit(make_clip_train_step(model), donate_argnums=0)

r = np.random.default_rng(0)
images = jnp.asarray(r.standard_normal((batch,336,336,3)).astype(np.float32), jnp.bfloat16)
texts = jnp.asarray(r.integers(1, 49000, (batch, 77)), jnp.int32)
batch_d = {"images": images, "texts": texts}

# production-style loop: one dispatch per step, donated state
state, m = step(state, batch_d); float(m["loss"])  # compile
K = 8
t0 = time.perf_counter()
for i in range(K):
    state, m = step(state, batch_d)
loss = float(m["loss"])  # forces chain (state dependency serializes steps)
dt = (time.perf_counter() - t0) / K
print(f"per-dispatch train step: {dt*1e3:.0f} ms -> {batch/dt:.1f} samples/s/chip (loss {loss:.3f})", flush=True)
