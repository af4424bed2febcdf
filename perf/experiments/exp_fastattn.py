"""Round-2: faster attention inside the W8A8 fused block.

The int8 fused block measures 21.2 ms/layer vs the ~13 ms int8 matmul floor;
the gap is the bf16 attention: half-rate K=64 matmuls plus ~5-8 ms of softmax
VPU passes (mask add, max reduce, sub+exp, sum reduce, bf16 cast over
B*H*n*n = 1.7G elements/layer). Variants (cumulative where marked):

  base   — ops/fused_block.py fused_block_int8 math (reproduce 21.2)
  nomax  — attn scale folded into dequant; static-C softmax (no max reduce);
           key mask + (-C) as one precomputed fp32 bias row
  bf16sm — nomax with bf16 logits + bf16 exp (half VPU read width)
  qk8    — nomax + q/k requantized to int8 straight from the qkv int32 acc
           (scalar weight scales for the q/k thirds); logits on the int8 MXU
  pv8    — qk8 + int8 p (x127) @ int8 v (scalar-requantized v third)
  n592   — winner + 592 query rows (sublane-only pad; k/v zero-padded to 640
           in-kernel) so projections/MLP skip the 577->640 lane padding
  rows2  — winner + 2 sequences per program (MXU/VPU overlap probe)

Run: python perf/experiments/exp_fastattn.py [variant ...] (default: all)
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
C_LOGIT = 12.0      # static softmax shift (calibrated per-checkpoint in prod)
ATT_SCALE = HD ** -0.5


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


def _qdot_acc(x32, a_scale, wq_ref):
    """int8 matmul, raw int32 accumulator (dequant left to the caller)."""
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    return jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


# --- attention bodies --------------------------------------------------------


def _attn_base(qkv, x_dtype):
    """Reference: per-head bf16 matmuls, masked fp32 max-softmax."""
    n = qkv.shape[0]
    d = D
    outs = []
    for g in range(H):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = qkv[:, d + g * HD:d + (g + 1) * HD]
        v = qkv[:, 2 * d + g * HD:2 * d + (g + 1) * HD]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ATT_SCALE
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        s = s + jnp.where(col < KV_VALID, 0.0, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l).astype(x_dtype))
    return jnp.concatenate(outs, axis=-1)


def _attn_nomax(qkv, brow, x_dtype, bf16sm):
    """Static-C softmax: p = exp(s + brow), brow = mask - C. No max pass.
    The attention scale is folded into the q third at dequant time."""
    d = D
    outs = []
    for g in range(H):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = qkv[:, d + g * HD:d + (g + 1) * HD]
        v = qkv[:, 2 * d + g * HD:2 * d + (g + 1) * HD]
        if bf16sm:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            p = jnp.exp(s + brow.astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp(s + brow)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(x_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        outs.append((o / l).astype(x_dtype))
    return jnp.concatenate(outs, axis=-1)


def _attn_qk8(acc_qkv, scales, brow, x_dtype, pv8, n_kv=None):
    """q/k requantized to int8 from the qkv int32 accumulator; int8 logits.

    scales: dict with fq, bq (q requant mul/add), fk, bk, g (logit dequant,
    includes attn scale), v dequant (fv per-column) or v8 requant (fv8, bv8,
    gv).
    """
    n = acc_qkv.shape[0]
    n_kv = n_kv or n
    d = D
    accf = acc_qkv.astype(jnp.float32)
    q8 = jnp.clip(jnp.round(accf[:, :d] * scales["fq"] + scales["bq"]),
                  -127, 127).astype(jnp.int8)
    k8 = jnp.clip(jnp.round(accf[:, d:2 * d] * scales["fk"] + scales["bk"]),
                  -127, 127).astype(jnp.int8)
    if n_kv > n:
        pad = jnp.zeros((n_kv - n, d), jnp.int8)
        k8 = jnp.concatenate([k8, pad], axis=0)
    if pv8:
        v8 = jnp.clip(
            jnp.round(accf[:, 2 * d:] * scales["fv8"] + scales["bv8"]),
            -127, 127).astype(jnp.int8)
        if n_kv > n:
            v8 = jnp.concatenate([v8, pad], axis=0)
    else:
        v = (accf[:, 2 * d:] * scales["fv"] + scales["bv"]).astype(x_dtype)
        if n_kv > n:
            v = jnp.concatenate(
                [v, jnp.zeros((n_kv - n, d), x_dtype)], axis=0)

    outs = []
    for g in range(H):
        q = q8[:, g * HD:(g + 1) * HD]
        k = k8[:, g * HD:(g + 1) * HD]
        s32 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        p = jnp.exp(s32.astype(jnp.float32) * scales["g"] + brow)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if pv8:
            pq = jnp.round(p * 127.0).astype(jnp.int8)
            vg = v8[:, g * HD:(g + 1) * HD]
            o32 = jax.lax.dot_general(
                pq, vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o = o32.astype(jnp.float32) * (scales["gv"] / 127.0)
        else:
            vg = v[:, g * HD:(g + 1) * HD]
            o = jax.lax.dot_general(
                p.astype(x_dtype), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        outs.append((o / l).astype(x_dtype))
    return jnp.concatenate(outs, axis=-1)


# --- block kernels -----------------------------------------------------------


def _block_kernel(
    x_ref, wqkv_ref, sqkv_ref, wo_ref, so_ref, w1_ref, s1_ref,
    w2_ref, s2_ref, g1_ref, g2_ref, ascale_ref, brow_ref, o_ref,
    *, variant, rows, n_kv,
):
    for r in range(rows):
        x = x_ref[r]
        a_qkv = ascale_ref[0, 0]
        a_o = ascale_ref[0, 1]
        a_1 = ascale_ref[0, 2]
        a_2 = ascale_ref[0, 3]

        h32 = _ln_f32(x, g1_ref[0])
        if variant in ("base", "nomax", "bf16sm"):
            qkv = _qdot(h32, a_qkv, wqkv_ref, sqkv_ref).astype(x.dtype)
            if variant == "base":
                att = _attn_base(qkv, x.dtype)
            else:
                att = _attn_nomax(qkv, brow_ref[0:1, 0, :],
                                  x.dtype, variant == "bf16sm")
        else:
            acc = _qdot_acc(h32, a_qkv, wqkv_ref)
            scales = {
                "fq": sqkv_ref[0, 0] * a_qkv,   # scalar-ified below
                "bq": 0.0,
                "fk": sqkv_ref[0, 0] * a_qkv,
                "bk": 0.0,
                "g": jnp.float32(ATT_SCALE * 0.02 * 0.02),
                "fv": sqkv_ref[0:1, 2 * D:] * a_qkv,
                "bv": 0.0,
                "fv8": sqkv_ref[0, 0] * a_qkv,
                "bv8": 0.0,
                "gv": jnp.float32(0.02),
            }
            att = _attn_qk8(acc, scales, brow_ref[0:1, 0, :], x.dtype,
                            pv8=(variant == "pv8"), n_kv=n_kv)

        x = x + _qdot(att.astype(jnp.float32), a_o, wo_ref,
                      so_ref).astype(x.dtype)

        h32 = _ln_f32(x, g2_ref[0])
        m1 = _qdot(h32, a_1, w1_ref, s1_ref)
        m1 = m1 * jax.nn.sigmoid(1.702 * m1)
        x = x + _qdot(m1, a_2, w2_ref, s2_ref).astype(x.dtype)
        o_ref[r] = x


def fused_block_v(x, p, variant, rows=1, n_kv=None):
    b, n, d = x.shape
    n_kv = n_kv or n

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel, variant=variant, rows=rows,
                          n_kv=n_kv),
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
            const((1, 1, n_kv)),
        ],
        out_specs=pl.BlockSpec((rows, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * n_kv * d),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * H * n * n_kv,
        ),
    )(x, p["wqkv_q"], p["sqkv"], p["wo_q"], p["so"], p["w1_q"], p["s1"],
      p["w2_q"], p["s2"], p["g1"].reshape(1, -1), p["g2"].reshape(1, -1),
      p["ascale"].reshape(1, 4), p["brow"][:n_kv].reshape(1, 1, -1))


def quantize(w, per_tensor=False):
    w = np.asarray(w, np.float32)
    if per_tensor:
        s = np.full((w.shape[1],), max(np.abs(w).max() / 127.0, 1e-8),
                    np.float32)
    else:
        s = np.abs(w).max(axis=0) / 127.0
        s = np.where(s == 0, 1.0, s)
    q = np.clip(np.rint(w / s), -127, 127)
    return jnp.asarray(q, jnp.int8), jnp.asarray(s, jnp.float32)


def make_params(key, l=L):
    ks = jax.random.split(key, l * 4)
    sc = 0.02
    out = []
    brow = np.where(np.arange(N) < KV_VALID, 0.0, NEG_INF) - C_LOGIT
    for i in range(l):
        wqkv = jax.random.normal(ks[4 * i], (D, 3 * D), jnp.float32) * sc
        wo = jax.random.normal(ks[4 * i + 1], (D, D), jnp.float32) * sc
        w1 = jax.random.normal(ks[4 * i + 2], (D, MLP), jnp.float32) * sc
        w2 = jax.random.normal(ks[4 * i + 3], (MLP, D), jnp.float32) * sc
        p = {}
        # q/k thirds per-tensor (scalar) scale so int8 logits factor out;
        # v third per-column
        q8, sq = quantize(np.asarray(wqkv)[:, :D], per_tensor=True)
        k8, sk = quantize(np.asarray(wqkv)[:, D:2 * D], per_tensor=True)
        v8, sv = quantize(np.asarray(wqkv)[:, 2 * D:])
        p["wqkv_q"] = jnp.concatenate([q8, k8, v8], axis=1)
        p["sqkv"] = jnp.concatenate([sq, sk, sv]).reshape(1, -1)
        p["wo_q"], p["so"] = quantize(wo)
        p["so"] = p["so"].reshape(1, -1)
        p["w1_q"], p["s1"] = quantize(w1)
        p["s1"] = p["s1"].reshape(1, -1)
        p["w2_q"], p["s2"] = quantize(w2)
        p["s2"] = p["s2"].reshape(1, -1)
        p["g1"] = jnp.ones((D,), jnp.bfloat16)
        p["g2"] = jnp.ones((D,), jnp.bfloat16)
        p["ascale"] = jnp.asarray([0.04, 0.01, 0.04, 0.02], jnp.float32)
        p["brow"] = jnp.asarray(brow, jnp.float32)
        out.append(p)
    return out


def bench_variant(name, params, x, rows=1, n_q=N):
    n_kv = N if n_q < N else None
    variant = {"n592": "pv8", "rows2": "pv8"}.get(name, name)
    if name == "n592":
        x = x[:, :n_q]
    if name == "rows2":
        rows = 2

    def model(params, x):
        for p in params:
            x = fused_block_v(x, p, variant, rows=rows, n_kv=n_kv)
        return x

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(params, x, iters):
        def body(_, salt):
            out = model(params, x + salt.astype(x.dtype))
            return out[0, 0, 0].astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))

    iters = 10
    float(loop(params, x, 1))
    float(loop(params, x, iters))
    t0 = time.perf_counter(); float(loop(params, x, 1))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(params, x, iters))
    tl = time.perf_counter() - t0
    per = (tl - ts) / (iters - 1)
    print(f"{name:8s}: {per * 1000 / L:6.2f} ms/layer "
          f"-> blocks-only {B / per:,.0f} img/s", flush=True)
    return per


if __name__ == "__main__":
    variants = sys.argv[1:] or [
        "base", "nomax", "bf16sm", "qk8", "pv8", "n592", "rows2"]
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    for v in variants:
        try:
            bench_variant(v, params, x, n_q=592 if v == "n592" else N)
        except Exception as e:
            print(f"{v:8s}: FAILED {type(e).__name__}: {e}", flush=True)
