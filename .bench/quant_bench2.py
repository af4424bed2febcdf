import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.core.factory import init_params
from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.models.clip import CLIP
from clip_embeds_tpu.models.quant import quantize_dense_tree, calibrate_act_scales

cfg = get_model_config("ViT-L-14-336", pretrained="openai")
batch = 256
raw = jnp.asarray(np.random.default_rng(0).standard_normal((batch,336,336,3)).astype(np.float32), jnp.bfloat16)
texts = jnp.asarray(np.random.default_rng(1).integers(1, 49000, (8, 77)), jnp.int32)

model_fp = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash")
params = init_params(model_fp, cfg)
qparams = quantize_dense_tree(jax.device_get(params))
qdyn = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash", quant="dynamic")
sparams = calibrate_act_scales(qdyn, qparams, [(raw[:8], texts)])
model_q = CLIP(cfg, dtype=jnp.bfloat16, attn_impl="flash", quant="static")
sparams = jax.device_put(sparams)

def bench(model, p, name, iters=10):
    @jax.jit
    def loop(p, raw, n):
        def body(_, salt):
            out = model.apply({"params": p}, raw + salt.astype(raw.dtype),
                              normalize=True, method="encode_image")
            return out[0,0].astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, n, body, jnp.asarray(1e-6))
    float(loop(p, raw, 1)); float(loop(p, raw, iters))
    t0=time.perf_counter(); float(loop(p, raw, 1)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(loop(p, raw, iters)); tn=time.perf_counter()-t0
    dt=(tn-t1)/(iters-1)
    print(f"{name}: {dt*1e3:.0f} ms {batch/dt:.1f} img/s", flush=True)

bench(model_q, sparams, "int8-static")
bench(model_fp, params, "bf16")
