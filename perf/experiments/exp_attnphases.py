"""int8 fused block with phase-reordered attention.

The per-head loop chains logits-matmul -> softmax -> pv sequentially; if
Mosaic cannot overlap head g's softmax (VPU) with head g+1's matmul (MXU),
attention costs their SUM. Reordering into three phases (all logits, all
softmaxes, all pv) exposes the parallelism explicitly. VMEM cost: all 16
fp32 logit tiles live at once (~24 MB at 592x640).

Variants: base (current production order), phases (reordered),
phases2 (logits+exp interleaved per head, pv separate).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
B, NQ, NKV, D, H = 256, 592, 640, 1024, 16
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
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (a_scale * wscale_ref[0])


def _attn(qkv, brow, mode, dtype):
    n = qkv.shape[0]
    d = D
    pad = jnp.zeros((NKV - n, 2 * d), qkv.dtype)
    kv = jnp.concatenate([qkv[:, d:], pad], axis=0)

    def logits(g):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = kv[:, g * HD:(g + 1) * HD]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def pv(p, g):
        v = kv[:, d + g * HD:d + (g + 1) * HD]
        return jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if mode == "base":
        outs = []
        for g in range(H):
            s = logits(g)
            p = jnp.exp(s + brow)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = pv(p.astype(dtype), g)
            outs.append((o / l).astype(dtype))
        return jnp.concatenate(outs, axis=-1)
    if mode == "phases":
        ss = [logits(g) for g in range(H)]
        ps = [jnp.exp(s + brow) for s in ss]
        ls = [jnp.sum(p, axis=-1, keepdims=True) for p in ps]
        outs = [
            (pv(p.astype(dtype), g) / l).astype(dtype)
            for g, (p, l) in enumerate(zip(ps, ls))
        ]
        return jnp.concatenate(outs, axis=-1)
    if mode == "phases2":
        ps, ls = [], []
        for g in range(H):
            s = logits(g)
            p = jnp.exp(s + brow)
            ps.append(p.astype(dtype))
            ls.append(jnp.sum(p, axis=-1, keepdims=True))
        outs = [
            (pv(p, g) / l).astype(dtype)
            for g, (p, l) in enumerate(zip(ps, ls))
        ]
        return jnp.concatenate(outs, axis=-1)
    raise KeyError(mode)


def _kernel(x_ref, wqkv_ref, sqkv_ref, wo_ref, so_ref, w1_ref, s1_ref,
            w2_ref, s2_ref, g1_ref, g2_ref, ascale_ref, brow_ref, o_ref,
            *, rows, mode):
    for r in range(rows):
        x = x_ref[r]
        a = ascale_ref[0]
        h32 = _ln_f32(x, g1_ref[0])
        qkv = _qdot(h32, a[0], wqkv_ref, sqkv_ref).astype(x.dtype)
        att = _attn(qkv, brow_ref[0:1, 0, :], mode, x.dtype)
        x = x + _qdot(att.astype(jnp.float32), a[1], wo_ref,
                      so_ref).astype(x.dtype)
        h32 = _ln_f32(x, g2_ref[0])
        m1 = _qdot(h32, a[2], w1_ref, s1_ref)
        m1 = m1 * jax.nn.sigmoid(1.702 * m1)
        x = x + _qdot(m1, a[3], w2_ref, s2_ref).astype(x.dtype)
        o_ref[r] = x


def block(x, p, rows, mode):
    b, n, d = x.shape

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, mode=mode),
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, n, d), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            const((d, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)),
            const((d, MLP)), const((1, MLP)),
            const((MLP, d)), const((1, d)),
            const((1, d)), const((1, d)),
            const((1, 4)),
            const((1, 1, NKV)),
        ],
        out_specs=pl.BlockSpec((rows, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * NKV * d),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * H * n * NKV,
        ),
    )(x, p["wqkv_q"], p["sqkv"], p["wo_q"], p["so"], p["w1_q"], p["s1"],
      p["w2_q"], p["s2"], p["g1"].reshape(1, -1), p["g2"].reshape(1, -1),
      p["ascale"].reshape(1, 4), p["brow"].reshape(1, 1, -1))


def quantize(w):
    w = np.asarray(w, np.float32)
    s = np.abs(w).max(axis=0) / 127.0
    s = np.where(s == 0, 1.0, s)
    return (jnp.asarray(np.clip(np.rint(w / s), -127, 127), jnp.int8),
            jnp.asarray(s, jnp.float32))


def make_params(key, l=L):
    ks = jax.random.split(key, l * 4)
    out = []
    brow = np.where(np.arange(NKV) < KV_VALID, 0.0, NEG_INF) - 12.0
    for i in range(l):
        p = {}
        p["wqkv_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i], (D, 3 * D))) * 0.02)
        p["sqkv"] = s.reshape(1, -1)
        p["wo_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i + 1], (D, D))) * 0.02)
        p["so"] = s.reshape(1, -1)
        p["w1_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i + 2], (D, MLP))) * 0.02)
        p["s1"] = s.reshape(1, -1)
        p["w2_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i + 3], (MLP, D))) * 0.02)
        p["s2"] = s.reshape(1, -1)
        p["g1"] = jnp.ones((D,), jnp.bfloat16)
        p["g2"] = jnp.ones((D,), jnp.bfloat16)
        p["ascale"] = jnp.asarray([0.04, 0.01, 0.04, 0.02], jnp.float32)
        p["brow"] = jnp.asarray(brow, jnp.float32)
        out.append(p)
    return out


def bench(mode, rows=4):
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, NQ, D), jnp.bfloat16)

    def model(params, x, salt):
        x = x + salt.astype(x.dtype)
        for p in params:
            x = block(x, p, rows, mode)
        return x

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(params, x, iters):
        def body(_, salt):
            out = model(params, x, salt)
            return out[0, 0, 0].astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))

    iters = 10
    float(loop(params, x, 1)); float(loop(params, x, iters))
    t0 = time.perf_counter(); float(loop(params, x, 1))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(params, x, iters))
    tl = time.perf_counter() - t0
    per = (tl - ts) / (iters - 1)
    print(f"{mode:8s} rows={rows}: {per * 1000 / L:6.2f} ms/layer -> "
          f"blocks-only {B / per:,.0f} img/s", flush=True)


if __name__ == "__main__":
    for mode in (sys.argv[1:] or ["base", "phases", "phases2"]):
        try:
            bench(mode)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
