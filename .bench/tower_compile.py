import sys; sys.path.insert(0, '/root/repo')
import time, jax, jax.numpy as jnp
t0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-t0:.0f}s] {m}", flush=True)

from clip_embeds_tpu.core.factory import create_model
base, params = create_model("ViT-L-14-336", pretrained="openai", dtype=jnp.bfloat16)
log("init done")
images = jnp.zeros((2, 336, 336, 3), jnp.bfloat16)
texts = jnp.zeros((2, 77), jnp.int32)

f_img = jax.jit(lambda i: base.apply({"params": params}, i, normalize=True, method="encode_image"))
f_img.lower(images).compile()
log("image tower compiled (batch 2)")
f_txt = jax.jit(lambda t: base.apply({"params": params}, t, normalize=True, method="encode_text"))
f_txt.lower(texts).compile()
log("text tower compiled (batch 2)")
f_both = jax.jit(lambda i, t: base.apply({"params": params}, i, t))
f_both.lower(images, texts).compile()
log("dual tower compiled (batch 2)")
