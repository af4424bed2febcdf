"""Prototype v2: fully packed attention — qkv [B,N,3,H,hd] in,
[B,N,H,hd] out, zero transposes. Head axis blocked by G (8-divisible)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
B, N, D, H = 256, 640, 1024, 16
HD = D // H
L = 24
KV_VALID = 577


def _kernel(qkv_ref, o_ref, *, scale, kv_valid, heads):
    outs = []
    for g in range(heads):
        q = qkv_ref[0, :, 0, g]       # [n, hd]
        k = qkv_ref[0, :, 1, g]
        v = qkv_ref[0, :, 2, g]
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
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)   # [n, g*hd], contiguous store


def packed_attention(qkv, kv_valid, g=8, vmem_mb=64):
    """qkv [B, N, 3, H, hd] -> [B, N, H, hd], no layout changes."""
    b, n, three, h, hd = qkv.shape
    grid = (b, h // g)
    return pl.pallas_call(
        functools.partial(_kernel, scale=hd**-0.5, kv_valid=kv_valid,
                          heads=g),
        grid=grid,
        in_specs=[pl.BlockSpec((1, n, 3, g, hd),
                               lambda bi, hi: (bi, 0, 0, hi, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, g * hd),
                               lambda bi, hi: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, h * hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qkv)


def check():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((2, N, 3, 16, HD)), jnp.bfloat16)
    for g in (8, 16):
        got = packed_attention(qkv, KV_VALID, g=g).reshape(2, N, 16, HD)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * HD**-0.5
        col = jnp.arange(N)
        s = jnp.where(col[None, None, None, :] < KV_VALID, s, -jnp.inf)
        ref = jnp.einsum("bhqk,bhkd->bhqd",
                         jax.nn.softmax(s, -1).astype(jnp.bfloat16), v)
        ref = ref.transpose(0, 2, 1, 3)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"G={g} packed2 max_err {err}")
        assert err < 0.05


def make_params(key):
    ks = jax.random.split(key, L * 4)
    s = 0.02
    return [{
        "wqkv": jax.random.normal(ks[4*i], (D, 3*D), jnp.bfloat16) * s,
        "wo": jax.random.normal(ks[4*i+1], (D, D), jnp.bfloat16) * s,
        "w1": jax.random.normal(ks[4*i+2], (D, 4*D), jnp.bfloat16) * s,
        "w2": jax.random.normal(ks[4*i+3], (4*D, D), jnp.bfloat16) * s,
        "g1": jnp.ones((D,), jnp.bfloat16),
        "g2": jnp.ones((D,), jnp.bfloat16),
    } for i in range(L)]


def ln(x, g):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * g


def make_block(g):
    def block(h, p):
        a = ln(h, p["g1"]) @ p["wqkv"]
        o = packed_attention(a.reshape(B, N, 3, H, HD), KV_VALID, g=g)
        h = h + o @ p["wo"]
        m = ln(h, p["g2"]) @ p["w1"]
        m = m * jax.nn.sigmoid(1.702 * m)
        return h + m @ p["w2"]
    return block


def bench():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    for g in (8, 16):
        blk = make_block(g)

        def model(params, x):
            for p in params:
                x = blk(x, p)
            return x

        @functools.partial(jax.jit, static_argnames="iters")
        def loop(params, x, iters):
            def body(_, salt):
                out = model(params, x + salt.astype(x.dtype))
                return out[0, 0, 0].astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))

        iters = 12
        float(loop(params, x, 1)); float(loop(params, x, iters))
        t0 = time.perf_counter(); float(loop(params, x, 1))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(params, x, iters))
        tl = time.perf_counter() - t0
        per = (tl - ts) / (iters - 1)
        print(f"packed2 G={g}: {per*1000/L:.2f} ms/layer")


if __name__ == "__main__":
    if "--bench" in sys.argv:
        bench()
    else:
        check()
