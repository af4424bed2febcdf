import sys; sys.path.insert(0, '/root/repo')
import time, jax, jax.numpy as jnp
t0 = time.perf_counter()
from __graft_entry__ import entry
fn, args = entry()
print(f"[{time.perf_counter()-t0:.0f}s] entry built", flush=True)
img, txt = jax.jit(fn)(*args)
v = float(jnp.linalg.norm(img[0].astype(jnp.float32)))
print(f"[{time.perf_counter()-t0:.0f}s] entry() OK: {img.shape} {txt.shape} norm={v:.3f}", flush=True)
