"""Differentiable wrapper for the fused serving block (training path).

The fused whole-block kernel (ops/fused_block.py) is forward-only; training
previously ran the composable flax blocks, paying a slower forward AND a
full forward recompute under remat (~287 ms/step at ViT-L bs64 — PERF.md).
This custom-VJP wrapper makes the kernel trainable with the same memory
profile as full per-block remat:

  forward : the fused Pallas kernel (one VMEM-resident pass per block),
            residuals = (x, params) only — exactly what remat keeps.
  backward: jax.vjp of ``block_reference`` below — the straight-line
            composable math (LN -> packed qkv -> Pallas flash attention with
            its fused backward kernel -> out proj -> LN -> MLP). The
            recompute cost is unchanged vs remat; the savings come from the
            ~2x faster fused forward on the forward pass.

Gradients are the exact gradients of ``block_reference`` evaluated at the
block's input — identical in formula to the composable path (the test
asserts exact agreement); the only difference downstream is the fused
forward's own rounding, the same class of difference remat tolerates.

Reference anchor: open_clip transformer.py:213-268 (ResidualAttentionBlock)
is the math; --grad-checkpointing (model.py:265-268) is the torch-side
feature this replaces with a faster TPU-native equivalent.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .attention import dot_product_attention
from .fused_block import fused_block


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _dense(x, p, dtype):
    return x @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


def block_reference(
    x: jax.Array,                 # [B, n, d]
    p: Dict[str, Any],            # ResidualAttentionBlock param tree
    *,
    heads: int,
    act,                          # callable activation (layers.get_act)
    ln_eps: float,
    causal: bool,
    attn_impl: str = "auto",
) -> jax.Array:
    """Composable pre-LN block as a pure function of (x, params).

    Identical math to models/layers.ResidualAttentionBlock (same LN / packed
    qkv / flash attention / residual structure); used as the custom-VJP
    recompute and as the gradient-exactness oracle in tests.
    """
    b, n, d = x.shape
    dtype = x.dtype
    hd = d // heads

    h = _ln(x, p["ln_1"]["scale"], p["ln_1"]["bias"], ln_eps)
    qkv = _dense(h, p["attn"]["in_proj"], dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    o = dot_product_attention(
        split_heads(q), split_heads(k), split_heads(v),
        causal=causal, impl=attn_impl,
    )
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + _dense(o, p["attn"]["out_proj"], dtype)

    h = _ln(x, p["ln_2"]["scale"], p["ln_2"]["bias"], ln_eps)
    h = act(_dense(h, p["mlp"]["c_fc"], dtype))
    return x + _dense(h, p["mlp"]["c_proj"], dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def make_fused_block_ad(
    heads: int,
    act_name: str,                # 'quick' | 'erf' | 'tanh'
    ln_eps: float,
    causal: bool,
    interpret: bool,
    bwd_impl: str = "vjp",        # 'vjp' | 'residual'
):
    """Build the custom-VJP fused block for a static configuration.

    Returned fn: (x [B, n, d], params tree) -> [B, n, d]. n need not be
    16-aligned — the forward pads queries internally (kv stays masked at the
    true length, like the serving path).

    bwd_impl='vjp' (round 3): backward = jax.vjp(block_reference) — a full
    COMPOSABLE forward recompute feeds the gradient math.
    bwd_impl='residual' (round 4): backward recomputes through
    ``fused_block_residuals`` — the fused kernel re-runs at kernel speed and
    hands the backward its matmul inputs (qkv, attention out, pre-act MLP
    hidden, post-attn residual) directly; only cheap elementwise pieces
    (LNs, activation, attention probs) recompute in XLA, via jax.vjp of the
    same sub-expressions block_reference uses, so gradients are the same
    formulas evaluated at kernel-precision intermediates.
    """
    act_fn = {
        "quick": lambda t: t * jax.nn.sigmoid(1.702 * t),
        "erf": functools.partial(jax.nn.gelu, approximate=False),
        "tanh": functools.partial(jax.nn.gelu, approximate=True),
    }[act_name]

    def fwd_impl(x, p):
        b, n, d = x.shape
        align = 8 if interpret else 16
        n_pad = _round_up(n, align)
        xp = x if n_pad == n else jnp.pad(
            x, [(0, 0), (0, n_pad - n), (0, 0)])
        y = fused_block(
            xp,
            p["attn"]["in_proj"]["kernel"], p["attn"]["in_proj"]["bias"],
            p["attn"]["out_proj"]["kernel"], p["attn"]["out_proj"]["bias"],
            p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"]["bias"],
            p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"]["bias"],
            jnp.stack([p["ln_1"]["scale"], p["ln_1"]["bias"]]),
            jnp.stack([p["ln_2"]["scale"], p["ln_2"]["bias"]]),
            heads=heads, kv_valid=n, act=act_name, ln_eps=ln_eps,
            causal=causal, interpret=interpret,
        )
        return y[:, :n] if n_pad != n else y

    @jax.custom_vjp
    def fused_block_ad(x, p):
        return fwd_impl(x, p)

    def fwd(x, p):
        return fwd_impl(x, p), (x, p)

    def bwd(res, g):
        x, p = res
        # Serialize the per-block recomputes. Each block's recompute depends
        # only on its saved (x, p) — all available the moment the backward
        # pass starts — so XLA's scheduler hoists every block's recompute to
        # the front and keeps all their intermediates live at once (measured:
        # 13.5 GB HLO temp, OOM at ViT-L bs32). Tying x to the incoming
        # cotangent makes block i's recompute wait for block i+1's backward,
        # restoring remat's one-block-at-a-time memory profile.
        x, g = jax.lax.optimization_barrier((x, g))
        _, vjp = jax.vjp(
            lambda x_, p_: block_reference(
                x_, p_, heads=heads, act=act_fn, ln_eps=ln_eps,
                causal=causal,
            ),
            x, p,
        )
        return vjp(g)

    def bwd_residual(res, g):
        from .fused_block import fused_block_residuals

        x, p = res
        x, g = jax.lax.optimization_barrier((x, g))
        b, n, d = x.shape
        dtype = x.dtype
        hd = d // heads
        align = 8 if interpret else 16
        n_pad = _round_up(n, align)
        xp = x if n_pad == n else jnp.pad(x, [(0, 0), (0, n_pad - n),
                                              (0, 0)])
        _, qkv, att, m1, x_mid = fused_block_residuals(
            xp,
            p["attn"]["in_proj"]["kernel"], p["attn"]["in_proj"]["bias"],
            p["attn"]["out_proj"]["kernel"], p["attn"]["out_proj"]["bias"],
            p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"]["bias"],
            p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"]["bias"],
            jnp.stack([p["ln_1"]["scale"], p["ln_1"]["bias"]]),
            jnp.stack([p["ln_2"]["scale"], p["ln_2"]["bias"]]),
            heads=heads, kv_valid=n, act=act_name, ln_eps=ln_eps,
            causal=causal, interpret=interpret,
        )
        if n_pad != n:
            qkv, att, m1, x_mid = (t[:, :n] for t in (qkv, att, m1, x_mid))

        w_qkv = p["attn"]["in_proj"]["kernel"].astype(dtype)
        w_o = p["attn"]["out_proj"]["kernel"].astype(dtype)
        w_1 = p["mlp"]["c_fc"]["kernel"].astype(dtype)
        w_2 = p["mlp"]["c_proj"]["kernel"].astype(dtype)

        # ---- MLP half: y = x_mid + c_proj(act(m1)), m1 = c_fc(ln2(x_mid))
        h2, ln2_vjp = jax.vjp(
            lambda xm, s, bb: _ln(xm, s, bb, ln_eps),
            x_mid, p["ln_2"]["scale"], p["ln_2"]["bias"],
        )
        m1act, act_vjp = jax.vjp(act_fn, m1)
        d_m1act = jnp.einsum("bnd,md->bnm", g, w_2)
        d_w2 = jnp.einsum("bnm,bnd->md", m1act, g)
        d_b2 = g.sum((0, 1))
        (d_m1,) = act_vjp(d_m1act)
        d_w1 = jnp.einsum("bnd,bnm->dm", h2, d_m1)
        d_b1 = d_m1.sum((0, 1))
        d_h2 = jnp.einsum("bnm,dm->bnd", d_m1, w_1)
        d_xmid_ln, d_ln2s, d_ln2b = ln2_vjp(d_h2)
        d_xmid = g + d_xmid_ln

        # ---- attention half: x_mid = x + out_proj(att)
        d_att = jnp.einsum("bnd,ed->bne", d_xmid, w_o)
        d_wo = jnp.einsum("bne,bnd->ed", att, d_xmid)
        d_bo = d_xmid.sum((0, 1))

        def attn_piece(qkv_):
            q, k, v = jnp.split(qkv_, 3, axis=-1)

            def split_heads(t):
                return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

            o = dot_product_attention(
                split_heads(q), split_heads(k), split_heads(v),
                causal=causal,
            )
            return o.transpose(0, 2, 1, 3).reshape(b, n, d)

        _, attn_vjp = jax.vjp(attn_piece, qkv)
        (d_qkv,) = attn_vjp(d_att)

        h1, ln1_vjp = jax.vjp(
            lambda xx, s, bb: _ln(xx, s, bb, ln_eps),
            x, p["ln_1"]["scale"], p["ln_1"]["bias"],
        )
        d_wqkv = jnp.einsum("bnd,bne->de", h1, d_qkv)
        d_bqkv = d_qkv.sum((0, 1))
        d_h1 = jnp.einsum("bne,de->bnd", d_qkv, w_qkv)
        d_x_ln, d_ln1s, d_ln1b = ln1_vjp(d_h1)
        d_x = d_xmid + d_x_ln

        dp = {
            "ln_1": {"scale": d_ln1s, "bias": d_ln1b},
            "ln_2": {"scale": d_ln2s, "bias": d_ln2b},
            "attn": {
                "in_proj": {"kernel": d_wqkv, "bias": d_bqkv},
                "out_proj": {"kernel": d_wo, "bias": d_bo},
            },
            "mlp": {
                "c_fc": {"kernel": d_w1, "bias": d_b1},
                "c_proj": {"kernel": d_w2, "bias": d_b2},
            },
        }
        # grads flow back through the params' .astype(dtype) casts
        dp = jax.tree.map(lambda g_, p_: g_.astype(p_.dtype), dp, p)
        return d_x, dp

    fused_block_ad.defvjp(
        fwd, bwd_residual if bwd_impl == "residual" else bwd)
    return fused_block_ad
