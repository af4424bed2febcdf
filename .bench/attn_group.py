import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 64, 16, 577, 64
NP = 640
r = np.random.default_rng(0)
mk = lambda shape: jnp.asarray(r.standard_normal(shape).astype(np.float32), jnp.bfloat16)
q = mk((B*H, NP, D)); k = mk((B*H, NP, D)); v = mk((B*H, NP, D))

def make_kernel(G):
    def kern(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[...]; kk = k_ref[...]; vv = v_ref[...]  # [G, NP, D]
        s = jax.lax.dot_general(qq, kk, (((2,),(2,)),((0,),(0,))),
                                preferred_element_type=jnp.float32) * (D**-0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vv.dtype), vv, (((2,),(1,)),((0,),(0,))),
                                preferred_element_type=jnp.float32)
        o_ref[...] = (o / l).astype(o_ref.dtype)
    return kern

def run(G, iters=10):
    f = jax.jit(lambda q,k,v: pl.pallas_call(
        make_kernel(G),
        grid=(B*H//G,),
        in_specs=[pl.BlockSpec((G, NP, D), lambda b:(b,0,0), memory_space=pltpu.VMEM)]*3,
        out_specs=pl.BlockSpec((G, NP, D), lambda b:(b,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B*H, NP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(q,k,v))
    x = f(q,k,v); float(jnp.sum(x).astype(jnp.float32))
    t0 = time.perf_counter()
    y = q
    for i in range(iters):
        y = f(y,k,v)
    float(jnp.sum(y).astype(jnp.float32))
    dt = (time.perf_counter()-t0)/iters
    print(f"G={G}: {dt*1e3:.2f} ms  {4*B*H*N*N*D/dt/1e12:.1f} TFLOPs(eff)", flush=True)

for G in (1, 2, 4, 8):
    run(G)
