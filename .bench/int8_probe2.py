import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

M, K = 32768, 4096
r = np.random.default_rng(0)
a_bf = jnp.asarray(r.standard_normal((M,K)).astype(np.float32) * 0.02, jnp.bfloat16)
b_bf = jnp.asarray(r.standard_normal((K,K)).astype(np.float32) * 0.02, jnp.bfloat16)
a_i8 = jnp.asarray(r.integers(-127,127,(M,K)), jnp.int8)
b_i8 = jnp.asarray(r.integers(-127,127,(K,K)), jnp.int8)

def bench(name, step, a, b, iters=10):
    @jax.jit
    def loop(n, a, b):
        return jax.lax.fori_loop(0, n, lambda _, x: step(x, b), a)
    float(jnp.sum(loop(1, a, b).astype(jnp.float32)))
    float(jnp.sum(loop(iters, a, b).astype(jnp.float32)))
    t0=time.perf_counter(); float(jnp.sum(loop(1, a, b).astype(jnp.float32))); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(jnp.sum(loop(iters, a, b).astype(jnp.float32))); tn=time.perf_counter()-t0
    dt = (tn - t1) / (iters - 1)
    print(f"{name}: {dt*1e3:.2f} ms  {2*M*K*K/dt/1e12:.0f} TFLOPs", flush=True)

def bf_step(x, b):
    return jax.lax.dot_general(x, b, (((1,),(0,)),((),())),
                               preferred_element_type=jnp.float32).astype(jnp.bfloat16)

def i8_step(x, b):
    out = jax.lax.dot_general(x, b, (((1,),(0,)),((),())),
                              preferred_element_type=jnp.int32)
    return jnp.clip(out // 4096, -127, 127).astype(jnp.int8)

bench("bf16", bf_step, a_bf, b_bf)
bench("int8", i8_step, a_i8, b_i8)
