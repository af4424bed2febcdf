import sys; sys.path.insert(0, '/root/repo')
import time, jax, jax.numpy as jnp
t0 = time.perf_counter()
def log(msg):
    print(f"[{time.perf_counter()-t0:.0f}s] {msg}", flush=True)

from clip_embeds_tpu.core.factory import create_model
from clip_embeds_tpu.models.clip import CLIP, stack_clip_params
log("imports done")
base, params = create_model("ViT-L-14-336", pretrained="openai", dtype=jnp.bfloat16)
log("create_model done (init compiled+ran)")
model = CLIP(base.cfg, dtype=jnp.bfloat16, scan_layers=True)
params = stack_clip_params(params)
log("params stacked")
images = jnp.zeros((2, 336, 336, 3), jnp.bfloat16)
texts = jnp.zeros((2, 77), jnp.int32)
fn = jax.jit(lambda i, t: model.apply({"params": params}, i, t))
lowered = fn.lower(images, texts)
log("lowered")
compiled = lowered.compile()
log("compiled")
out = compiled(images, texts)
log("dispatched")
v = float(jnp.linalg.norm(out["image_features"][0].astype(jnp.float32)))
log(f"done, norm={v}")
