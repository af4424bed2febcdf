import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from clip_embeds_tpu.ops.attention import reference_attention
from clip_embeds_tpu.ops.flash_attention import flash_attention

B, H, N, D = 64, 16, 577, 64
r = np.random.default_rng(0)
q = jnp.asarray(r.standard_normal((B,H,N,D)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(r.standard_normal((B,H,N,D)).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(r.standard_normal((B,H,N,D)).astype(np.float32), jnp.bfloat16)

def bench(fn, name, iters=10):
    f = jax.jit(fn)
    out = f(q,k,v); float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    x = q
    for i in range(iters):
        x = f(x,k,v)
    float(jnp.sum(x).astype(jnp.float32))
    dt = (time.perf_counter()-t0)/iters
    flops = 4*B*H*N*N*D
    print(f"{name}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TFLOPs", flush=True)

bench(lambda a,b,c: reference_attention(a,b,c), "xla-ref")
bench(lambda a,b,c: flash_attention(a,b,c), "pallas-bq128")
for bq in (256, 640):
    bench(lambda a,b,c,bq=bq: flash_attention(a,b,c,False,bq), f"pallas-bq{bq}")
