import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.core.factory import init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP
from clip_embeds_tpu.train.optim import adamw
from clip_embeds_tpu.train.schedules import cosine_lr
from clip_embeds_tpu.train.steps import TrainState

cfg = get_model_config("ViT-L-14-336", pretrained="openai")
model = CLIP(cfg, dtype=jnp.bfloat16)
params = init_params(model, cfg)

for name, tx in [("adamw+cosine", adamw(cosine_lr(1e-5, 100, 1000))),
                 ("adamw+const", adamw(1e-5))]:
    state = TrainState.create(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    @jax.jit
    def upd(s, g, n):
        def body(_, s):
            return s.apply_gradients(g)
        return jax.lax.fori_loop(0, n, body, s)
    upd_j = jax.jit(upd, static_argnums=2)
    s = upd_j(state, grads, 1); float(s.params["logit_scale"])
    s = upd_j(state, grads, 4); float(s.params["logit_scale"])
    t0=time.perf_counter(); s=upd_j(state, grads, 1); float(s.params["logit_scale"]); t1=time.perf_counter()-t0
    t0=time.perf_counter(); s=upd_j(state, grads, 4); float(s.params["logit_scale"]); tn=time.perf_counter()-t0
    print(f"{name}: {(tn-t1)/3*1e3:.0f} ms/update", flush=True)
