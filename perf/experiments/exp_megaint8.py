"""Prototype: fused block with int8 weights + int8 activations (W8A8)."""
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
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g.astype(jnp.float32)


def _qdot(x32, a_scale, wq_ref, wscale_ref):
    """fp32 activations -> int8 quant -> int8 matmul -> fp32 dequant."""
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (a_scale * wscale_ref[0])


def _block_kernel(
    x_ref, wqkv_ref, sqkv_ref, wo_ref, so_ref, w1_ref, s1_ref,
    w2_ref, s2_ref, g1_ref, g2_ref, ascale_ref, o_ref,
    *, scale, kv_valid,
):
    x = x_ref[0]                                  # [n, d] bf16
    a_qkv = ascale_ref[0, 0]
    a_o = ascale_ref[0, 1]
    a_1 = ascale_ref[0, 2]
    a_2 = ascale_ref[0, 3]

    h32 = _ln_f32(x, g1_ref[0])
    qkv = _qdot(h32, a_qkv, wqkv_ref, sqkv_ref).astype(x.dtype)

    d = x.shape[-1]
    outs = []
    for g in range(H):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = qkv[:, d + g * HD:d + (g + 1) * HD]
        v = qkv[:, 2 * d + g * HD:2 * d + (g + 1) * HD]
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
    att = jnp.concatenate(outs, axis=-1)

    x = x + _qdot(att.astype(jnp.float32), a_o, wo_ref, so_ref).astype(x.dtype)

    h32 = _ln_f32(x, g2_ref[0])
    m1 = _qdot(h32, a_1, w1_ref, s1_ref)
    m1 = m1 * jax.nn.sigmoid(1.702 * m1)
    x = x + _qdot(m1, a_2, w2_ref, s2_ref).astype(x.dtype)
    o_ref[0] = x


def fused_block_int8(x, p, kv_valid=KV_VALID):
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
            const((d, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)),
            const((d, MLP)), const((1, MLP)),
            const((MLP, d)), const((1, d)),
            const((1, d)), const((1, d)),
            const((1, 4)),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * n * d),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * H * n * n,
        ),
    )(x, p["wqkv_q"], p["sqkv"], p["wo_q"], p["so"], p["w1_q"], p["s1"],
      p["w2_q"], p["s2"], p["g1"].reshape(1, -1), p["g2"].reshape(1, -1),
      p["ascale"].reshape(1, 4))


def quantize(w):
    s = np.abs(np.asarray(w, np.float32)).max(axis=0) / 127.0
    s = np.where(s == 0, 1.0, s)
    q = np.clip(np.rint(np.asarray(w, np.float32) / s), -127, 127)
    return jnp.asarray(q, jnp.int8), jnp.asarray(s, jnp.float32)


def make_params(key, l=L):
    ks = jax.random.split(key, l * 4)
    sc = 0.02
    out = []
    for i in range(l):
        wqkv = jax.random.normal(ks[4*i], (D, 3*D), jnp.float32) * sc
        wo = jax.random.normal(ks[4*i+1], (D, D), jnp.float32) * sc
        w1 = jax.random.normal(ks[4*i+2], (D, MLP), jnp.float32) * sc
        w2 = jax.random.normal(ks[4*i+3], (MLP, D), jnp.float32) * sc
        p = {}
        p["wqkv_q"], p["sqkv"] = quantize(wqkv)
        p["sqkv"] = p["sqkv"].reshape(1, -1)
        p["wo_q"], p["so"] = quantize(wo)
        p["so"] = p["so"].reshape(1, -1)
        p["w1_q"], p["s1"] = quantize(w1)
        p["s1"] = p["s1"].reshape(1, -1)
        p["w2_q"], p["s2"] = quantize(w2)
        p["s2"] = p["s2"].reshape(1, -1)
        p["g1"] = jnp.ones((D,), jnp.bfloat16)
        p["g2"] = jnp.ones((D,), jnp.bfloat16)
        # static act scales: rough (abs-max of N(0,1) LN output ~ 5/127)
        p["ascale"] = jnp.asarray([0.04, 0.01, 0.04, 0.02], jnp.float32)
        out.append(p)
    return out


def bench():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)

    def model(params, x):
        for p in params:
            x = fused_block_int8(x, p)
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
    print(f"megablock_int8: {per*1000/L:.2f} ms/layer")


if __name__ == "__main__":
    bench()
