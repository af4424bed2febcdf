import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as stock_fa, BlockSizes
from clip_embeds_tpu.ops.flash_attention import flash_attention as mine

B, H, N, D = 64, 16, 577, 64
r = np.random.default_rng(0)
mk = lambda: jnp.asarray(r.standard_normal((B,H,N,D)).astype(np.float32), jnp.bfloat16)
q,k,v = mk(), mk(), mk()
# pad to 640 for stock (needs divisible blocks)
pad = [(0,0),(0,0),(0,63),(0,0)]
qp, kp, vp = (jnp.pad(x, pad) for x in (q,k,v))

def bench(f, x0, name, iters=10):
    g = jax.jit(f)
    out = g(x0); float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    x = x0
    for i in range(iters):
        x = g(x)
    float(jnp.sum(x).astype(jnp.float32))
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms  {4*B*H*N*N*D/dt/1e12:.1f} TFLOPs", flush=True)

bs = BlockSizes(block_q=640, block_k_major=640, block_k=640, block_b=1,
                block_q_major_dkv=640, block_k_major_dkv=640, block_k_dkv=640, block_q_dkv=640,
                block_k_major_dq=640, block_k_dq=640, block_q_dq=640)
bench(lambda x: stock_fa(x, kp, vp, sm_scale=D**-0.5, block_sizes=bs), qp, "stock-640")
bench(lambda x: mine(x, k, v), q, "mine-auto")
# try bigger batch grouping: fold heads into batch for stock? already [B,H,N,D]
