import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

M, K, N = 147456, 1024, 4096
r = np.random.default_rng(0)
a_bf = jnp.asarray(r.standard_normal((M,K)).astype(np.float32), jnp.bfloat16)
b_bf = jnp.asarray(r.standard_normal((K,N)).astype(np.float32), jnp.bfloat16)
a_i8 = jnp.asarray(r.integers(-127,127,(M,K)), jnp.int8)
b_i8 = jnp.asarray(r.integers(-127,127,(K,N)), jnp.int8)

def bench(f, args, name, iters=10):
    @jax.jit
    def loop(n, *args):
        def body(_, c):
            out = f(*args)
            return c + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0))
    float(loop(1, *args)); float(loop(iters, *args))
    t0=time.perf_counter(); float(loop(1, *args)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(loop(iters, *args)); tn=time.perf_counter()-t0
    dt = (tn-t1)/(iters-1)
    print(f"{name}: {dt*1e3:.2f} ms  {2*M*K*N/dt/1e12:.0f} TFLOPs", flush=True)

bench(lambda a,b: jax.lax.dot_general(a,b,(((1,),(0,)),((),())), preferred_element_type=jnp.float32), (a_bf,b_bf), "bf16")
bench(lambda a,b: jax.lax.dot_general(a,b,(((1,),(0,)),((),())), preferred_element_type=jnp.int32), (a_i8,b_i8), "int8")
