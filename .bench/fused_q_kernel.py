import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 147456, 1024, 4096   # ViT-L c_fc at batch 256
TM, TN = 512, 1024
r = np.random.default_rng(0)
x = jnp.asarray(r.standard_normal((M,K)).astype(np.float32)*0.5, jnp.bfloat16)
wq = jnp.asarray(r.integers(-127,127,(K,N)), jnp.int8)
wscale = jnp.asarray(r.random(N).astype(np.float32)*0.01 + 0.005)
bias = jnp.asarray(r.standard_normal(N).astype(np.float32)*0.1)
act_scale = jnp.float32(0.02)

def kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, inv_a):
    xx = x_ref[...]
    xq = jnp.clip(jnp.round(xx.astype(jnp.float32) * inv_a), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[...], (((1,),(0,)),((),())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * ws_ref[...][None, :] * (1.0/inv_a) + b_ref[...][None, :]
    o_ref[...] = (y * jax.nn.sigmoid(1.702*y)).astype(o_ref.dtype)  # quickgelu

@jax.jit
def fused(x, wq, ws, b):
    return pl.pallas_call(
        functools.partial(kernel, inv_a=float(1.0/0.02)),
        grid=(M//TM, N//TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i,j:(i,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda i,j:(0,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN,), lambda i,j:(j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN,), lambda i,j:(j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i,j:(i,j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M,N), jnp.bfloat16),
    )(x, wq, ws, b)

@jax.jit
def xla_path(x, wq, ws, b):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)/0.02), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,),(0,)),((),())), preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32)*ws[None,:]*0.02 + b[None,:]
    return (y*jax.nn.sigmoid(1.702*y)).astype(jnp.bfloat16)

@jax.jit
def bf16_path(x, w, b):
    y = jax.lax.dot_general(x, w, (((1,),(0,)),((),())), preferred_element_type=jnp.float32) + b[None,:]
    return (y*jax.nn.sigmoid(1.702*y)).astype(jnp.bfloat16)

wb = (wq.astype(jnp.float32)*wscale[None,:]).astype(jnp.bfloat16)

def bench(f, args, name, iters=8):
    out = f(*args); float(jnp.sum(out[:8,:8].astype(jnp.float32)))
    t0=time.perf_counter()
    y = args[0]
    # chain via input perturbation
    o = None
    for i in range(iters):
        o = f(*args)
        args = (args[0] + o[:, :K].astype(args[0].dtype)*1e-6 if o.shape[1]>=K else args[0], *args[1:])
    float(jnp.sum(o[:8,:8].astype(jnp.float32)))
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms  {2*M*K*N/dt/1e12:.0f} TFLOPs-equiv", flush=True)

# correctness
o_f = fused(x, wq, wscale, bias)
o_x = xla_path(x, wq, wscale, bias)
print("fused vs xla max diff:", float(jnp.max(jnp.abs(o_f.astype(jnp.float32)-o_x.astype(jnp.float32)))), flush=True)
bench(bf16_path, (x, wb, bias), "bf16+gelu (xla)")
bench(xla_path, (x, wq, wscale, bias), "int8 xla (quant+mm+gelu)")
bench(fused, (x, wq, wscale, bias), "int8 fused pallas")
