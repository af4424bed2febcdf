"""Prototype: head-grouped flash attention kernel — G heads per program."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
B, H, N, D = 256, 16, 640, 64
KV_VALID = 577


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_valid, heads):
    for g in range(heads):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        n = s.shape[-1]
        if kv_valid < n:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            s = s + jnp.where(col < kv_valid, 0.0, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = (o / l).astype(o_ref.dtype)


def grouped_attention(q, k, v, heads_per_block, kv_valid):
    b, h, n, d = q.shape
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    g = heads_per_block
    grid = (bh // g,)
    blk = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=d**-0.5, kv_valid=kv_valid,
                          heads=g),
        grid=grid,
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def check():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 4, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 4, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 4, N, D)), jnp.bfloat16)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * D**-0.5
    col = jnp.arange(N)
    s = jnp.where(col[None, None, None, :] < KV_VALID, s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd",
                     jax.nn.softmax(s, -1).astype(jnp.bfloat16), v)
    for g in (1, 2, 4, 8):
        got = grouped_attention(q, k, v, g, KV_VALID)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"G={g} max_err={err:.4f}")
        assert err < 0.05


def bench():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.1, jnp.bfloat16)

    for g in (1, 4, 8, 16):
        @functools.partial(jax.jit, static_argnames="iters")
        def loop(q, k, v, iters, g=g):
            def body(_, salt):
                out = grouped_attention(q + salt.astype(q.dtype), k, v, g,
                                        KV_VALID)
                return out[0, 0, 0, 0].astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))

        iters = 24
        float(loop(q, k, v, 1)); float(loop(q, k, v, iters))
        t0 = time.perf_counter(); float(loop(q, k, v, 1))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(q, k, v, iters))
        tl = time.perf_counter() - t0
        per = (tl - ts) / (iters - 1)
        print(f"G={g}: {per*1000:.2f} ms per attention layer-equivalent")


if __name__ == "__main__":
    if "--bench" in sys.argv:
        bench()
    else:
        check()
