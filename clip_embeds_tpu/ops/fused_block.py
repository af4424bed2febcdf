"""Fully fused pre-LN transformer block as one Pallas TPU kernel.

Serving-path optimization for the ViT/text encoder hot loop (reference
open_clip/src/open_clip/transformer.py:213-268 ResidualAttentionBlock).
Measured on v5e (ViT-L shapes, batch 256, seq 640): the composable
layers+Pallas-attention path costs ~42 ms/layer; the bottleneck is NOT the
MXU (the four projections alone run at ~peak, 17 ms/layer) but the HBM
round-trips between ops — qkv split copies, 4 head transposes, fp32
logits/probs materialization (XLA attention), LN/GELU elementwise passes.
This kernel runs the whole block per batch-row in VMEM:

    x' = x + out_proj(attn(LN1(x) @ Wqkv))
    y  = x' + W2 @ act(W1 @ LN2(x'))

Grid is (B,); the weight blocks use constant index maps so Mosaic fetches
them once and keeps them VMEM-resident across programs. Per-head attention
slices the packed qkv along lanes (static 64/128-wide slices), computes fp32
logits/softmax in VMEM, and concatenates head outputs back to [n, D] —
zero HBM layout traffic. 30.6 ms/layer measured (matmul floor ~24).

Forward-only: the training path keeps the composable blocks (layers.py),
whose Pallas flash attention has a fused backward. The wrapper falls back to
the composable math on non-TPU backends (pallas interpret mode is used in
tests for bit-level checking).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, g1_ref, g2_ref, o_ref, *,
    heads: int, scale: float, kv_valid: int, quick_gelu: bool, ln_eps: float,
    causal: bool,
):
    x = x_ref[0]                                   # [n, d]
    n, d = x.shape
    hd = d // heads

    h = _ln(x, g1_ref[0, 0], g1_ref[0, 1], ln_eps)
    qkv = (_dot(h, wqkv_ref[...])
           + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)  # [n, 3d]

    outs = []
    for g in range(heads):
        q = qkv[:, g * hd:(g + 1) * hd]
        k = qkv[:, d + g * hd:d + (g + 1) * hd]
        v = qkv[:, 2 * d + g * hd:2 * d + (g + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                  # [n, n] fp32
        if causal:
            col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            mask = (col < kv_valid) & (col <= row)
            s = jnp.where(mask, s, NEG_INF)
        elif kv_valid < n:
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
    att = jnp.concatenate(outs, axis=-1)           # [n, d]

    x = x + (_dot(att, wo_ref[...])
             + bo_ref[0].astype(jnp.float32)).astype(x.dtype)

    h = _ln(x, g2_ref[0, 0], g2_ref[0, 1], ln_eps)
    m1 = _dot(h, w1_ref[...]) + b1_ref[0].astype(jnp.float32)
    if quick_gelu:
        m1 = m1 * jax.nn.sigmoid(1.702 * m1)
    else:
        m1 = jax.nn.gelu(m1, approximate=False)
    m1 = m1.astype(x.dtype)
    x = x + (_dot(m1, w2_ref[...])
             + b2_ref[0].astype(jnp.float32)).astype(x.dtype)
    o_ref[0] = x


def fused_block(
    x: jax.Array,                  # [B, n, d] (n padded to 128-multiple)
    wqkv: jax.Array,               # [d, 3d]
    bqkv: jax.Array,               # [3d]
    wo: jax.Array,                 # [d, d]
    bo: jax.Array,                 # [d]
    w1: jax.Array,                 # [d, mlp]
    b1: jax.Array,                 # [mlp]
    w2: jax.Array,                 # [mlp, d]
    b2: jax.Array,                 # [d]
    ln1: jax.Array,                # [2, d] (scale, bias)
    ln2: jax.Array,                # [2, d]
    heads: int,
    kv_valid: int,
    quick_gelu: bool = False,
    ln_eps: float = 1e-5,
    causal: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One fused pre-LN transformer block; returns [B, n, d]."""
    b, n, d = x.shape
    mlp = w1.shape[1]
    dt = x.dtype

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    weights = [
        wqkv.astype(dt), bqkv.astype(dt).reshape(1, -1),
        wo.astype(dt), bo.astype(dt).reshape(1, -1),
        w1.astype(dt), b1.astype(dt).reshape(1, -1),
        w2.astype(dt), b2.astype(dt).reshape(1, -1),
        ln1.astype(dt).reshape(1, 2, d), ln2.astype(dt).reshape(1, 2, d),
    ]
    specs = [
        const((d, 3 * d)), const((1, 3 * d)),
        const((d, d)), const((1, d)),
        const((d, mlp)), const((1, mlp)),
        const((mlp, d)), const((1, d)),
        const((1, 2, d)), const((1, 2, d)),
    ]
    # VMEM budget: weights + x tile + qkv + fp32 logits + mlp hidden
    vmem = min(
        110 * 1024 * 1024,
        int(1.8 * (sum(w.size * 2 for w in weights)
                   + n * 3 * d * 2 + n * n * 4 + n * mlp * 4 + 4 * n * d * 2)),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, scale=(d // heads) ** -0.5,
            kv_valid=kv_valid, quick_gelu=quick_gelu, ln_eps=ln_eps,
            causal=causal,
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (3 * d * d + d * d + 2 * d * mlp)
            + 4 * b * heads * n * n * (d // heads),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * heads * n * n + b * n * mlp,
        ),
        interpret=interpret,
    )(x, *weights)


def fused_block_supported(n: int, d: int, heads: int, mlp_ratio: float) -> bool:
    """Shapes the kernel handles well: 128-aligned seq, lane-aligned head
    dim, and a VMEM footprint that fits (ViT-L/H-class blocks)."""
    hd = d // heads
    if n % 128 != 0 or d % 128 != 0 or hd % 8 != 0:
        return False
    mlp = int(d * mlp_ratio)
    weight_bytes = (3 * d * d + d * d + 2 * d * mlp) * 2
    act_bytes = n * (3 * d + 4 * d) * 2 + n * n * 4 + n * mlp * 4
    return weight_bytes + act_bytes < 100 * 1024 * 1024


# -- W8A8 variant ------------------------------------------------------------
#
# Same fused block with int8 weights (per-out-channel scales) and int8
# activations (static per-layer scales, models/quant.py calibration). The
# int8 MXU path doubles matmul rate on v5e: 21.2 ms/layer measured vs 30.6
# bf16 (perf/experiments/exp_megaint8.py). Attention stays bf16 (its matmuls
# are tiny); only the four projections quantize.


def _qdot(x32, a_scale, wq_ref, wscale_ref, bias_ref):
    """fp32 activations -> int8 -> int8xint8 matmul -> fp32 dequant + bias."""
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (a_scale * wscale_ref[0])
            + bias_ref[0].astype(jnp.float32))


def _kernel_int8(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, g1_ref, g2_ref,
    ascale_ref, o_ref, *,
    heads: int, scale: float, kv_valid: int, quick_gelu: bool, ln_eps: float,
):
    x = x_ref[0]
    n, d = x.shape
    hd = d // heads
    a = ascale_ref[0]

    h32 = _ln(x, g1_ref[0, 0], g1_ref[0, 1], ln_eps).astype(jnp.float32)
    qkv = _qdot(h32, a[0], wqkv_ref, sqkv_ref, bqkv_ref).astype(x.dtype)

    outs = []
    for g in range(heads):
        q = qkv[:, g * hd:(g + 1) * hd]
        k = qkv[:, d + g * hd:d + (g + 1) * hd]
        v = qkv[:, 2 * d + g * hd:2 * d + (g + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
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

    x = x + _qdot(att.astype(jnp.float32), a[1], wo_ref, so_ref,
                  bo_ref).astype(x.dtype)

    h32 = _ln(x, g2_ref[0, 0], g2_ref[0, 1], ln_eps).astype(jnp.float32)
    m1 = _qdot(h32, a[2], w1_ref, s1_ref, b1_ref)
    if quick_gelu:
        m1 = m1 * jax.nn.sigmoid(1.702 * m1)
    else:
        m1 = jax.nn.gelu(m1, approximate=False)
    x = x + _qdot(m1, a[3], w2_ref, s2_ref, b2_ref).astype(x.dtype)
    o_ref[0] = x


def fused_block_int8(
    x: jax.Array,                 # [B, n, d]
    wqkv_q, sqkv, bqkv,           # int8 [d,3d], fp32 [3d], fp32 [3d]
    wo_q, so, bo,
    w1_q, s1, b1,
    w2_q, s2, b2,
    ln1, ln2,                     # [2, d]
    act_scales,                   # fp32 [4]: qkv, out, fc, proj
    heads: int,
    kv_valid: int,
    quick_gelu: bool = False,
    ln_eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    b, n, d = x.shape
    mlp = w1_q.shape[1]
    dt = x.dtype

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    args = [
        wqkv_q, jnp.asarray(sqkv, jnp.float32).reshape(1, -1),
        jnp.asarray(bqkv, jnp.float32).reshape(1, -1),
        wo_q, jnp.asarray(so, jnp.float32).reshape(1, -1),
        jnp.asarray(bo, jnp.float32).reshape(1, -1),
        w1_q, jnp.asarray(s1, jnp.float32).reshape(1, -1),
        jnp.asarray(b1, jnp.float32).reshape(1, -1),
        w2_q, jnp.asarray(s2, jnp.float32).reshape(1, -1),
        jnp.asarray(b2, jnp.float32).reshape(1, -1),
        ln1.astype(dt).reshape(1, 2, d), ln2.astype(dt).reshape(1, 2, d),
        jnp.asarray(act_scales, jnp.float32).reshape(1, 4),
    ]
    specs = [
        const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
        const((d, d)), const((1, d)), const((1, d)),
        const((d, mlp)), const((1, mlp)), const((1, mlp)),
        const((mlp, d)), const((1, d)), const((1, d)),
        const((1, 2, d)), const((1, 2, d)),
        const((1, 4)),
    ]
    return pl.pallas_call(
        functools.partial(
            _kernel_int8, heads=heads, scale=(d // heads) ** -0.5,
            kv_valid=kv_valid, quick_gelu=quick_gelu, ln_eps=ln_eps,
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (3 * d * d + d * d + 2 * d * mlp)
            + 4 * b * heads * n * n * (d // heads),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * heads * n * n + b * n * mlp,
        ),
        interpret=interpret,
    )(x, *args)
