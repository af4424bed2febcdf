import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.core.factory import init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP
from clip_embeds_tpu.losses.clip_loss import clip_loss

cfg = get_model_config("ViT-L-14-336", pretrained="openai")
batch = 32
r = np.random.default_rng(0)
images = jnp.asarray(r.standard_normal((batch,336,336,3)).astype(np.float32), jnp.bfloat16)
texts = jnp.asarray(r.integers(1, 49000, (batch, 77)), jnp.int32)

def bench(name, model, params, iters=4):
    def loss_fn(p, images):
        out = model.apply({"params": p}, images, texts)
        return clip_loss(out["image_features"], out["text_features"], out["logit_scale"])
    @jax.jit
    def gradloop(p, images, n):
        def body(_, carry):
            g = jax.grad(loss_fn)(p, images + carry.astype(images.dtype))
            return g["logit_scale"].astype(jnp.bfloat16) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.bfloat16))
    gl = jax.jit(gradloop, static_argnums=2)
    float(gl(params, images, 1).astype(jnp.float32)); float(gl(params, images, iters).astype(jnp.float32))
    t0=time.perf_counter(); float(gl(params, images, 1).astype(jnp.float32)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(gl(params, images, iters).astype(jnp.float32)); tn=time.perf_counter()-t0
    dt=(tn-t1)/(iters-1)
    print(f"{name}: {dt*1e3:.0f} ms/grad-step -> {batch/dt:.1f} samples/s", flush=True)

m1 = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash", remat=False)
params = init_params(m1, cfg)
bench("flash,noremat", m1, params)
m2 = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash", remat=True)
bench("flash,remat", m2, params)
m3 = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="reference", remat=False)
bench("xla-attn,noremat", m3, params)
