"""Prototype: fully fused transformer block as ONE Pallas kernel.

Grid (B,); per program: x [n, D] tile, ALL block weights resident in VMEM
(constant index_map -> fetched once), compute LN1 -> qkv -> per-head
attention -> out-proj -> +res -> LN2 -> MLP(quickgelu) -> +res, store x'.
HBM traffic per layer ~= x in + x out + weights once.
"""
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
MLP = 4 * D


def _ln_f32(x, g):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * g


def _block_kernel(
    x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, g1_ref, g2_ref, o_ref,
    *, scale, kv_valid,
):
    x = x_ref[0]                                  # [n, D] bf16
    h = _ln_f32(x, g1_ref[0])
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)                             # [n, 3D]

    outs = []
    for g in range(H):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = qkv[:, D + g * HD:D + (g + 1) * HD]
        v = qkv[:, 2 * D + g * HD:2 * D + (g + 1) * HD]
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
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l).astype(x.dtype))
    att = jnp.concatenate(outs, axis=-1)          # [n, D]

    x = x + jax.lax.dot_general(
        att, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    h = _ln_f32(x, g2_ref[0])
    m1 = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m1 = (m1 * jax.nn.sigmoid(1.702 * m1)).astype(x.dtype)  # quickgelu fp32
    x = x + jax.lax.dot_general(
        m1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    o_ref[0] = x


def fused_block(x, p, kv_valid=KV_VALID, vmem_mb=100):
    b, n, d = x.shape

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel, scale=HD**-0.5, kv_valid=kv_valid),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            const((d, 3 * d)),
            const((d, d)),
            const((d, MLP)),
            const((MLP, d)),
            const((1, d)),
            const((1, d)),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * n * d),
            bytes_accessed=2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * H * n * n,
        ),
    )(x, p["wqkv"], p["wo"], p["w1"], p["w2"],
      p["g1"].reshape(1, -1), p["g2"].reshape(1, -1))


def make_params(key, l=L):
    ks = jax.random.split(key, l * 4)
    s = 0.02
    return [{
        "wqkv": jax.random.normal(ks[4*i], (D, 3*D), jnp.bfloat16) * s,
        "wo": jax.random.normal(ks[4*i+1], (D, D), jnp.bfloat16) * s,
        "w1": jax.random.normal(ks[4*i+2], (D, MLP), jnp.bfloat16) * s,
        "w2": jax.random.normal(ks[4*i+3], (MLP, D), jnp.bfloat16) * s,
        "g1": jnp.ones((D,), jnp.bfloat16),
        "g2": jnp.ones((D,), jnp.bfloat16),
    } for i in range(l)]


def ref_block(h, p):
    hh = _ln_f32(h, p["g1"])
    a = hh @ p["wqkv"]
    q = a[..., :D].reshape(h.shape[0], N, H, HD).transpose(0, 2, 1, 3)
    k = a[..., D:2*D].reshape(h.shape[0], N, H, HD).transpose(0, 2, 1, 3)
    v = a[..., 2*D:].reshape(h.shape[0], N, H, HD).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * HD**-0.5
    col = jnp.arange(N)
    s = jnp.where(col[None, None, None, :] < KV_VALID, s, -jnp.inf)
    o = jnp.einsum("bhqk,bhkd->bhqd",
                   jax.nn.softmax(s, -1).astype(h.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(h.shape[0], N, D)
    h = h + (o @ p["wo"]).astype(h.dtype)
    m = _ln_f32(h, p["g2"]).astype(jnp.bfloat16) @ p["w1"]
    m32 = m.astype(jnp.float32)
    m = (m32 * jax.nn.sigmoid(1.702 * m32)).astype(jnp.bfloat16)
    return h + (m @ p["w2"]).astype(h.dtype)


def check():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, N, D)) * 0.5, jnp.bfloat16)
    p = make_params(jax.random.PRNGKey(0), 1)[0]
    got = fused_block(x, p)
    want = ref_block(x, p)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print("megablock max_err", err, "rel", rel)
    assert rel < 0.05


def bench():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)

    def model(params, x):
        for p in params:
            x = fused_block(x, p)
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
    print(f"megablock: {per*1000/L:.2f} ms/layer")


if __name__ == "__main__" and "--phased" not in sys.argv:
    if "--bench" in sys.argv:
        bench()
    else:
        check()


def _block_kernel_phased(
    x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, g1_ref, g2_ref, o_ref,
    *, scale, kv_valid,
):
    """Attention in three phases: all QK dots -> all softmax -> all PV."""
    x = x_ref[0]
    h = _ln_f32(x, g1_ref[0]).astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    d = x.shape[-1]
    n = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    kv_bias = jnp.where(col < kv_valid, 0.0, NEG_INF)

    logits = []
    for g in range(H):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = qkv[:, d + g * HD:d + (g + 1) * HD]
        logits.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + kv_bias)
    probs = []
    for g in range(H):
        s = logits[g]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        probs.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype))
    outs = []
    for g in range(H):
        v = qkv[:, 2 * d + g * HD:2 * d + (g + 1) * HD]
        outs.append(jax.lax.dot_general(
            probs[g], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
    att = jnp.concatenate(outs, axis=-1)

    x = x + jax.lax.dot_general(
        att, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    hh = _ln_f32(x, g2_ref[0])
    m1 = jax.lax.dot_general(
        hh.astype(x.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m1 = (m1 * jax.nn.sigmoid(1.702 * m1)).astype(x.dtype)
    x = x + jax.lax.dot_general(
        m1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    o_ref[0] = x


def fused_block_phased(x, p, kv_valid=KV_VALID, vmem_mb=110):
    b, n, d = x.shape

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel_phased, scale=HD**-0.5,
                          kv_valid=kv_valid),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            const((d, 3 * d)), const((d, d)), const((d, MLP)),
            const((MLP, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * n * d),
            bytes_accessed=2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * H * n * n,
        ),
    )(x, p["wqkv"], p["wo"], p["w1"], p["w2"],
      p["g1"].reshape(1, -1), p["g2"].reshape(1, -1))


def bench_phased():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)

    def model(params, x):
        for p in params:
            x = fused_block_phased(x, p)
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
    print(f"megablock_phased: {per*1000/L:.2f} ms/layer")


if __name__ == "__main__" and "--phased" in sys.argv:
    bench_phased()
