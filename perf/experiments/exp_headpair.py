"""int8 fused block with head-PAIR packed attention (block-diagonal).

exp_attnphases.py showed the per-head chain is not serialization-bound:
Mosaic already pipelines heads. The remaining hypothesis for the ~4.5
ms/layer gap to the int8 matmul floor is LANE under-utilization: per-head
operands have 64 lanes (head_dim) of 128, so the q/k logits matmul
([592,64]x[64,640]) and the pv matmul output ([592,640]x[640,64]) run the
MXU at half width.

Pair packing builds 128-lane operands for two heads g,h at once:

  q2 = [q_g | q_h]                      [n, 128]
  k2 = [[k_g, 0], [0, k_h]]             [2*NKV, 128] (block-diagonal)
  v2 = [[v_g, 0], [0, v_h]]             [2*NKV, 128]
  s2 = q2 contract k2 (dim1 x dim1)  -> [n, 2*NKV] = [s_g | s_h]
  p2 = exp(s2 + [brow|brow])
  o2 = p2 @ v2                       -> [n, 128] = [o_g*l_g | o_h*l_h]

The zero blocks burn MACs the half-idle lanes were burning anyway; if the
hardware pads 64-lane operands to 128, this halves attention matmul time.
Costs: VPU copies to build k2/v2 (2x [1280,128] bf16 per pair) and two
lane-range reductions for the normalizers.

Modes: base (production per-head), pair (block-diag logits+pv),
pair_pvsplit (block-diag logits only; pv per head).
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

    if mode == "base":
        outs = []
        for g in range(H):
            q = qkv[:, g * HD:(g + 1) * HD]
            k = kv[:, g * HD:(g + 1) * HD]
            v = kv[:, d + g * HD:d + (g + 1) * HD]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp(s + brow)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(dtype))
        return jnp.concatenate(outs, axis=-1)

    z = jnp.zeros((NKV, HD), qkv.dtype)
    brow2 = jnp.concatenate([brow, brow], axis=-1)
    outs = []
    for g in range(0, H, 2):
        qg = qkv[:, g * HD:(g + 1) * HD]
        qh = qkv[:, (g + 1) * HD:(g + 2) * HD]
        q2 = jnp.concatenate([qg, qh], axis=-1)            # [n, 128]
        kg = kv[:, g * HD:(g + 1) * HD]
        kh = kv[:, (g + 1) * HD:(g + 2) * HD]
        k2 = jnp.concatenate([
            jnp.concatenate([kg, z], axis=-1),
            jnp.concatenate([z, kh], axis=-1)], axis=0)    # [2NKV, 128]
        s2 = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [n, 2NKV]
        p2 = jnp.exp(s2 + brow2)
        lg = jnp.sum(p2[:, :NKV], axis=-1, keepdims=True)
        lh = jnp.sum(p2[:, NKV:], axis=-1, keepdims=True)
        vg = kv[:, d + g * HD:d + (g + 1) * HD]
        vh = kv[:, d + (g + 1) * HD:d + (g + 2) * HD]
        if mode == "pair":
            v2 = jnp.concatenate([
                jnp.concatenate([vg, z], axis=-1),
                jnp.concatenate([z, vh], axis=-1)], axis=0)
            o2 = jax.lax.dot_general(
                p2.astype(dtype), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [n, 128]
            outs.append((o2[:, :HD] / lg).astype(dtype))
            outs.append((o2[:, HD:] / lh).astype(dtype))
        elif mode == "pair_pvsplit":
            og = jax.lax.dot_general(
                p2[:, :NKV].astype(dtype), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            oh = jax.lax.dot_general(
                p2[:, NKV:].astype(dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((og / lg).astype(dtype))
            outs.append((oh / lh).astype(dtype))
        else:
            raise KeyError(mode)
    return jnp.concatenate(outs, axis=-1)


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


def check(mode):
    """Numerical agreement vs base on a tiny slice (interpret on CPU is too
    slow for full shapes; compare on-device)."""
    params = make_params(jax.random.PRNGKey(0), l=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, NQ, D), jnp.bfloat16)
    a = np.asarray(block(x, params[0], 1, "base"), np.float32)
    b = np.asarray(block(x, params[0], 1, mode), np.float32)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"{mode}: max rel err vs base {err:.2e}", flush=True)


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
    print(f"{mode:12s} rows={rows}: {per * 1000 / L:6.2f} ms/layer -> "
          f"blocks-only {B / per:,.0f} img/s", flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["check"]:
        for mode in ("pair", "pair_pvsplit"):
            check(mode)
    else:
        for mode in (sys.argv[1:] or ["base", "pair", "pair_pvsplit"]):
            try:
                bench(mode)
            except Exception as e:
                print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
