"""Pallas TPU fused attention kernel.

Replaces the reference's external CUDA attention (flash-attention-2 at
VLM2Vec/src/vlm_backbone/qwen2_vl/modeling_qwen2_vl.py:50-55, torch SDPA at
open_clip/src/open_clip/transformer.py:161-166) with a TPU-native kernel.

Design point: the stack's sequence lengths are short (577 ViT tokens @336px,
77 text tokens, <=2048 for LLaVA — SURVEY.md §5 "long context"), so the whole
K/V block for one (batch, head) fits comfortably in VMEM. The kernel therefore
blocks over Q only and computes an exact row softmax per Q tile — no online
rescaling passes — with fp32 logits on the MXU and bf16 IO. Padded KV columns
are masked via the static valid length; Q is padded by the wrapper and sliced
back.

Backward is a fused Pallas kernel too: per (batch*head, q-tile) it recomputes
the probability tile from (q, k) — cheaper than storing the [N, N] matrix —
and accumulates dK/dV across q-tiles into revisited output blocks (TPU grid
iteration is sequential, so read-modify-write accumulation is sound), while
dQ writes per tile. Residuals are just (q, k, v, o): the delta term
rowsum(dO*O) replaces the usual (m, l) bookkeeping.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
    kv_valid: int, block_q: int,
):
    qi = pl.program_id(1)
    # Keep matmul inputs in their storage dtype (bf16) — the MXU accumulates
    # in fp32 via preferred_element_type; upcasting inputs first would force
    # the slow fp32 MXU path.
    q = q_ref[0]                               # [block_q, D]
    k = k_ref[0]                               # [N, D]
    v = v_ref[0]                               # [N, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # [block_q, N] fp32

    n = s.shape[-1]
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, n), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, n), 0)
        mask = col < kv_valid
        mask = jnp.logical_and(mask, col <= row + qi * block_q)
        s = jnp.where(mask, s, NEG_INF)
    elif kv_valid < n:
        # padded KV columns: one additive bias row instead of a full-matrix
        # select — a single broadcast add on the VPU
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        s = s + jnp.where(col < kv_valid, 0.0, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # Probabilities drop to the storage dtype for the PV matmul (bf16 MXU
    # rate); the fp32 row sums keep normalization exact.
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_attention_fwd_impl(
    q: jax.Array, k: jax.Array, v: jax.Array, causal: bool, block_q: int
) -> jax.Array:
    """q,k,v: [B, H, N, D] -> [B, H, N, D]."""
    b, h, n, d = q.shape
    scale = d ** -0.5
    n_pad = _round_up(n, block_q)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    bh = b * h
    qf = q.reshape(bh, n_pad, d)
    kf = k.reshape(bh, n_pad, d)
    vf = v.reshape(bh, n_pad, d)

    grid = (bh, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, causal=causal,
            kv_valid=n, block_q=block_q,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bhi, qi: (bhi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bhi, qi: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bhi, qi: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bhi, qi: (bhi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * d,
            bytes_accessed=4 * bh * n_pad * d * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
    )(qf, kf, vf)
    out = out.reshape(b, h, n_pad, d)
    return out[:, :, :n, :]


def _pick_block_q(n: int) -> int:
    """Largest Q tile whose fp32 logits buffer stays comfortably in VMEM.

    One block per (b, h) is fastest at this stack's lengths (577/640 tokens:
    single 640-wide tile beats 128-tiling by ~25% on v5e); longer sequences
    tile at 512/256 to bound the bq x n_pad fp32 logits buffer (~4 MB).
    """
    n_pad = _round_up(n, 128)
    if n_pad <= 768:
        return n_pad
    for bq in (512, 256, 128):
        if n_pad % bq == 0:
            return bq
    return 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    block_q: int = 0,
) -> jax.Array:
    """Fused TPU attention on [B, H, N, D]; D <= 128, any N (padded inside).

    block_q == 0 selects the tile size automatically.
    """
    if block_q == 0:
        block_q = _pick_block_q(q.shape[-2])
    return _flash_attention_fwd_impl(q, k, v, causal, block_q)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
    scale: float, causal: bool, kv_valid: int, block_q: int,
):
    qi = pl.program_id(1)
    q = q_ref[0]                                # [bq, D]
    k = k_ref[0]                                # [N, D]
    v = v_ref[0]                                # [N, D]
    o = o_ref[0].astype(jnp.float32)            # [bq, D]
    do = do_ref[0].astype(jnp.float32)          # [bq, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # [bq, N]
    n = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, n), 1)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, n), 0)
        mask = (col < kv_valid) & (col <= row + qi * block_q)
    else:
        mask = col < kv_valid
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # normalized probs, fp32
    # guard fully-masked (padded) q rows: exp(NEG_INF - NEG_INF) = 1 row
    p = jnp.where(mask, p, 0.0)

    pv_dtype = v_ref.dtype
    # dV += P^T dO
    dv = jax.lax.dot_general(
        p.astype(pv_dtype), do.astype(pv_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [N, D]
    # dP = dO V^T ; delta = rowsum(dO * O)
    dp = jax.lax.dot_general(
        do.astype(pv_dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [bq, N]
    delta = jnp.sum(do * o, axis=-1, keepdims=True)   # [bq, 1]
    ds = p * (dp - delta) * scale               # [bq, N] fp32
    ds_c = ds.astype(pv_dtype)
    dq = jax.lax.dot_general(
        ds_c, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                           # [bq, D]
    dk = jax.lax.dot_general(
        ds_c, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                           # [N, D]

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(qi != 0)
    def _accum():
        dk_ref[0] = dk_ref[0] + dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv.astype(dv_ref.dtype)


def _flash_attention_bwd_impl(q, k, v, o, g, causal: bool, block_q: int):
    b, h, n, d = q.shape
    scale = d ** -0.5
    n_pad = _round_up(n, block_q)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q, k, v, o, g = (jnp.pad(t, pad) for t in (q, k, v, o, g))
    bh = b * h
    qf, kf, vf, of, gf = (
        t.reshape(bh, n_pad, d) for t in (q, k, v, o, g)
    )
    grid = (bh, n_pad // block_q)
    full = pl.BlockSpec((1, n_pad, d), lambda bhi, qi: (bhi, 0, 0),
                        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, block_q, d), lambda bhi, qi: (bhi, qi, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=scale, causal=causal, kv_valid=n,
            block_q=block_q,
        ),
        grid=grid,
        in_specs=[tile, full, full, tile, tile],
        out_specs=[tile, full, full],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_pad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n_pad * n_pad * d,
            bytes_accessed=8 * bh * n_pad * d * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
    )(qf, kf, vf, of, gf)

    def unpad(t, dtype):
        return t.reshape(b, h, n_pad, d)[:, :, :n, :].astype(dtype)

    return unpad(dq, q.dtype), unpad(dk, k.dtype), unpad(dv, v.dtype)


def _pack_residual(t: jax.Array):
    """[B,H,N,64] -> [B,H,ceil(N/2),128]: pair rows into full 128-lane tiles.

    With head_dim 64 the natural layout wastes half of every (8,128) HBM
    tile; the saved residuals are long-lived (until the backward pass), so
    packing halves residual memory — this is what makes no-remat ViT-L
    training fit (PERF.md round-2 training notes). The relayout copy is
    ~1 ms/layer of bandwidth, recovered many times over.
    """
    b, h, n, d = t.shape
    if d != 64:
        return t, n
    if n % 2 != 0:
        t = jnp.pad(t, [(0, 0), (0, 0), (0, 1), (0, 0)])
    return t.reshape(b, h, -1, 128), n


def _unpack_residual(t: jax.Array, n: int) -> jax.Array:
    b, h, half, d = t.shape
    if d != 128:
        return t
    return t.reshape(b, h, 2 * half, 64)[:, :, :n]


def _fwd(q, k, v, causal, block_q):
    if block_q == 0:
        block_q = _pick_block_q(q.shape[-2])
    out = _flash_attention_fwd_impl(q, k, v, causal, block_q)
    packed = tuple(_pack_residual(t) for t in (q, k, v, out))
    return out, packed


def _bwd(causal, block_q, residuals, g):
    q, k, v, o = (_unpack_residual(t, n) for t, n in residuals)
    if block_q == 0:
        block_q = _pick_block_q(q.shape[-2])
    return _flash_attention_bwd_impl(q, k, v, o, g, causal, block_q)


flash_attention.defvjp(_fwd, _bwd)
