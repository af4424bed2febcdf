import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.core.factory import create_model, init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP

cfg = get_model_config("ViT-L-14-336")
batch = 256
raw = jnp.asarray(np.random.default_rng(0).standard_normal((batch,336,336,3)).astype(np.float32), jnp.bfloat16)

model_flash = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash")
model_ref = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="reference")
params = init_params(model_flash, cfg)
params = jax.device_put(jax.tree.map(lambda x: x, params))

def bench(model, name, iters=8):
    @jax.jit
    def embed(p, images):
        return model.apply({"params": p}, images, normalize=True, method="encode_image")
    out = embed(params, raw); float(out[0,0].astype(jnp.float32))
    t0 = time.perf_counter()
    salt = jnp.asarray(0.0, jnp.bfloat16)
    for i in range(iters):
        out = embed(params, raw + salt)
        salt = out[0,0] * jnp.asarray(1e-6, jnp.bfloat16)
    float(salt.astype(jnp.float32))
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.0f} ms/iter  {batch/dt:.1f} img/s", flush=True)

bench(model_ref, "xla-ref")
bench(model_flash, "pallas-flash-auto")
