import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.core.factory import init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP

cfg = get_model_config("ViT-L-14-336", pretrained="openai")
model = CLIP(cfg, dtype=jnp.bfloat16)
params = init_params(model, cfg)
grads = jax.tree.map(jnp.ones_like, params)

def timeit(name, fn, *args, iters=6):
    f = jax.jit(fn, static_argnums=len(args))
    out = f(*args, 1); jax.tree.leaves(out)[0][...  ] if False else float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    float(jnp.sum(jax.tree.leaves(f(*args, iters))[0]).astype(jnp.float32))
    t0=time.perf_counter(); float(jnp.sum(jax.tree.leaves(f(*args,1))[0]).astype(jnp.float32)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(jnp.sum(jax.tree.leaves(f(*args,iters))[0]).astype(jnp.float32)); tn=time.perf_counter()-t0
    print(f"{name}: {(tn-t1)/(iters-1)*1e3:.0f} ms", flush=True)

def sgd(p, g, n):
    def body(_, p):
        return jax.tree.map(lambda a, b: a - 0.01*b, p, g)
    return jax.lax.fori_loop(0, n, body, p)
timeit("sgd-tree", sgd, params, grads)

import optax
tx = optax.adam(1e-5)
opt_state = tx.init(params)
def adam_up(p, s, g, n):
    def body(_, carry):
        p, s = carry
        u, s2 = tx.update(g, s, p)
        return (optax.apply_updates(p, u), s2)
    return jax.lax.fori_loop(0, n, body, (p, s))
timeit("optax-adam", adam_up, params, opt_state, grads)
