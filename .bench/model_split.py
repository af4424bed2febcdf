import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
import clip_embeds_tpu.ops.attention as attn_mod
from clip_embeds_tpu.core.factory import init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP

cfg = get_model_config("ViT-L-14-336", pretrained="openai")  # QuickGELU like real ckpt

def bench(model, params, batch, name, iters=8):
    raw = jnp.asarray(np.random.default_rng(0).standard_normal((batch,336,336,3)).astype(np.float32), jnp.bfloat16)
    @jax.jit
    def loop(p, raw, n):
        def body(_, salt):
            out = model.apply({"params": p}, raw + salt.astype(raw.dtype), normalize=True, method="encode_image")
            return out[0,0].astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, n, body, jnp.asarray(1e-6))
    float(loop(params, raw, 1)); float(loop(params, raw, iters))
    t0=time.perf_counter(); float(loop(params, raw, 1)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(loop(params, raw, iters)); tn=time.perf_counter()-t0
    dt = (tn-t1)/(iters-1)
    print(f"{name} batch={batch}: {dt*1e3:.0f} ms/iter {batch/dt:.1f} img/s", flush=True)

model = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash")
params = init_params(model, cfg)

bench(model, params, 256, "flash-quickgelu")
bench(model, params, 512, "flash-quickgelu")

# dense-only: identity attention to isolate non-attention time
orig = attn_mod.dot_product_attention
attn_mod.dot_product_attention = lambda q,k,v,**kw: v
model2 = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="reference")
bench(model2, params, 256, "no-attention")
attn_mod.dot_product_attention = orig
