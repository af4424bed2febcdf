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

def make_kernel(mode):
    def kern(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[0]; kk = k_ref[0]; vv = v_ref[0]
        s = jax.lax.dot_general(qq, kk, (((1,),(1,)),((),())), preferred_element_type=jnp.float32) * (D**-0.5)
        if mode == "matmul_only":
            p = s
        elif mode == "exp_only":
            p = jnp.exp(s)
        elif mode == "softmax_nomax":
            p = jnp.exp(s)
            l = jnp.sum(p, axis=-1, keepdims=True)
        elif mode == "full":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vv.dtype), vv, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
        if mode in ("softmax_nomax", "full"):
            o = o / l
        o_ref[0] = o.astype(o_ref.dtype)
    return kern

def run(mode, iters=10):
    f = jax.jit(lambda q,k,v: pl.pallas_call(
        make_kernel(mode),
        grid=(B*H, 1),
        in_specs=[pl.BlockSpec((1, NP, D), lambda b,i:(b,0,0), memory_space=pltpu.VMEM)]*3,
        out_specs=pl.BlockSpec((1, NP, D), lambda b,i:(b,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B*H, NP, D), q.dtype),
    )(q,k,v))
    x = f(q,k,v); float(jnp.sum(x).astype(jnp.float32))
    t0 = time.perf_counter()
    y = q
    for i in range(iters):
        y = f(y,k,v)
    float(jnp.sum(y).astype(jnp.float32))
    dt = (time.perf_counter()-t0)/iters
    print(f"{mode}: {dt*1e3:.2f} ms", flush=True)

for mode in ("matmul_only", "exp_only", "softmax_nomax", "full"):
    run(mode)
