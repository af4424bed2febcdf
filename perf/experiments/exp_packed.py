"""Prototype: packed-qkv attention kernel — no transposes/splits in-model."""
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


def _kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, o_ref, *, scale, kv_valid):
    q = qkv_q_ref[0, :, 0, 0]     # [bq, hd]
    k = qkv_k_ref[0, :, 0, 0]     # [n, hd]
    v = qkv_v_ref[0, :, 0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
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
    o_ref[0, :, 0] = (o / l).astype(o_ref.dtype)


def packed_attention(qkv, kv_valid):
    """qkv [B, N, 3, H, hd] -> [B, N, H, hd]."""
    b, n, three, h, hd = qkv.shape
    grid = (b, h)
    qs = pl.BlockSpec((1, n, 1, 1, hd), lambda bi, hi: (bi, 0, 0, hi, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, n, 1, 1, hd), lambda bi, hi: (bi, 0, 1, hi, 0),
                      memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((1, n, 1, 1, hd), lambda bi, hi: (bi, 0, 2, hi, 0),
                      memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((1, n, 1, hd), lambda bi, hi: (bi, 0, hi, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=hd**-0.5, kv_valid=kv_valid),
        grid=grid,
        in_specs=[qs, ks, vs],
        out_specs=os_,
        out_shape=jax.ShapeDtypeStruct((b, n, h, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qkv, qkv, qkv)


def check():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((2, N, 3, 4, HD)), jnp.bfloat16)
    got = packed_attention(qkv, KV_VALID)
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
    print("packed max_err", err)
    assert err < 0.05


# ---- full block timing (same harness as exp_decompose) ----

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


def block_packed(h, p):
    a = ln(h, p["g1"]) @ p["wqkv"]
    o = packed_attention(a.reshape(B, N, 3, H, HD), KV_VALID)
    h = h + o.reshape(B, N, D) @ p["wo"]
    m = ln(h, p["g2"]) @ p["w1"]
    m = m * jax.nn.sigmoid(1.702 * m)
    return h + m @ p["w2"]


def bench():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)

    def model(params, x):
        for p in params:
            x = block_packed(x, p)
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
    print(f"packed_block: {per*1000/L:.2f} ms/layer "
          f"({B/(per/L)/1000:.1f}k img-equiv/s/layer)")


if __name__ == "__main__" and "--bench2" not in sys.argv:
    if "--bench" in sys.argv:
        bench()
    else:
        check()


def block_layout_only(h, p):
    """Same reshapes/split/transposes as the pallas block, kernel replaced
    with identity — isolates the layout cost."""
    a = ln(h, p["g1"]) @ p["wqkv"]
    q = a[..., :D].reshape(B, N, H, HD).transpose(0, 2, 1, 3)
    k = a[..., D:2*D].reshape(B, N, H, HD).transpose(0, 2, 1, 3)
    v = a[..., 2*D:].reshape(B, N, H, HD).transpose(0, 2, 1, 3)
    o = q + 0.0 * k[:, :, :1] + 0.0 * v[:, :, :1]  # keep k,v live
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    h = h + o @ p["wo"]
    m = ln(h, p["g2"]) @ p["w1"]
    m = m * jax.nn.sigmoid(1.702 * m)
    return h + m @ p["w2"]


def _kernel5(q_ref, k_ref, v_ref, o_ref, *, scale, kv_valid):
    q = q_ref[0, 0, 0]     # [n, hd]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
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
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def packed5_attention(qkv, kv_valid):
    """qkv [B, 3, H, N, hd] -> [B, H, N, hd]."""
    b, three, h, n, hd = qkv.shape
    grid = (b, h)

    def spec(t):
        return pl.BlockSpec((1, 1, 1, n, hd),
                            lambda bi, hi, t=t: (bi, t, hi, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel5, scale=hd**-0.5, kv_valid=kv_valid),
        grid=grid,
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, 1, n, hd),
                               lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qkv, qkv, qkv)


def block_packed5(h, p):
    a = ln(h, p["g1"]) @ p["wqkv"]
    qkv = a.reshape(B, N, 3, H, HD).transpose(0, 2, 3, 1, 4)  # 1 transpose
    o = packed5_attention(qkv, KV_VALID)                      # [B,H,N,hd]
    o = jnp.einsum("bhnd,hdo->bno", o,
                   p["wo"].reshape(H, HD, D))
    h = h + o
    m = ln(h, p["g2"]) @ p["w1"]
    m = m * jax.nn.sigmoid(1.702 * m)
    return h + m @ p["w2"]


def bench_blk(name, blk):
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)

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
    print(f"{name}: {per*1000/L:.2f} ms/layer")


if __name__ == "__main__" and "--bench2" in sys.argv:
    bench_blk("layout_only", block_layout_only)
    bench_blk("packed5", block_packed5)
