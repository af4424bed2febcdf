"""Fused serving path: CLIP image encoding through one-kernel-per-block.

Reads the standard CLIP param tree (models/vit.py layout) and replays
encode_image with ops/fused_block.py — the whole residual stream stays in
VMEM per block, so the HBM layout traffic of the composable path (qkv
splits, head transposes, LN/GELU passes) disappears. Numerics match the
composable path to bf16 tolerance; use for inference/serving only (the
composable path owns training).

The sequence is padded once to a 16-multiple (sublane alignment) before the
block stack; the kernels pad k/v to the 128-aligned lane count internally and
mask padded keys via kv_valid. Padded query rows are discarded after, so all
24 blocks run at a static MXU-friendly shape without paying 577->640 lane
padding in the projections/MLP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.fused_block import fused_block, fused_block_supported
from .clip import l2_normalize
from .vit import patchify


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_encode_image(
    model,                        # models.clip.CLIP (vit tower)
    params: Dict[str, Any],
    images: jax.Array,            # [B, S, S, 3]
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    cls_fast_last: bool = True,
    output_tokens: bool = False,
) -> jax.Array:
    """encode_image via fused block kernels; returns [B, embed_dim].

    With ``output_tokens`` returns (pooled, tokens [B, N, width]) exactly
    like the composable encode_image(output_tokens=True) — the PACL/SPARC
    frozen-tower tap (reference pacl.py:97 visual patch tokens). Token
    output reads every row, so the CLS-only last block is disabled.
    """
    cfg = model.cfg.vision
    if cfg.tower != "vit":
        raise NotImplementedError("fused serving path covers ViT towers")
    p = params["visual"]
    quick = model.cfg.quick_gelu
    b = images.shape[0]

    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"].astype(dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    n_valid = x.shape[1]

    if not cfg.no_ln_pre:
        ln = p["ln_pre"]
        x = _ln_affine(x, ln["scale"], ln["bias"])

    # query rows only need sublane (16) alignment; the kernel zero-pads k/v
    # to the 128-aligned lane count internally (ops/fused_block.py round 2)
    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    # pool 'tok' reads only the CLS row of the final block output, so the
    # last block runs in CLS-only form (k/v full, q/out/MLP one row)
    use_cls_fast = cls_fast_last and cfg.pool_type == "tok" \
        and not output_tokens
    n_fused = cfg.layers - 1 if use_cls_fast else cfg.layers

    blocks = p["transformer"]
    for i in range(n_fused):
        bp = blocks[f"resblocks_{i}"]
        x = fused_block(
            x,
            bp["attn"]["in_proj"]["kernel"], bp["attn"]["in_proj"]["bias"],
            bp["attn"]["out_proj"]["kernel"], bp["attn"]["out_proj"]["bias"],
            bp["mlp"]["c_fc"]["kernel"], bp["mlp"]["c_fc"]["bias"],
            bp["mlp"]["c_proj"]["kernel"], bp["mlp"]["c_proj"]["bias"],
            jnp.stack([bp["ln_1"]["scale"], bp["ln_1"]["bias"]]),
            jnp.stack([bp["ln_2"]["scale"], bp["ln_2"]["bias"]]),
            heads=cfg.heads, kv_valid=n_valid, quick_gelu=quick,
            interpret=interpret,
        )

    lnp = p["ln_post"]
    if use_cls_fast:
        pooled = _cls_only_last_block(
            x, blocks[f"resblocks_{cfg.layers - 1}"], cfg.heads, n_valid,
            quick, dtype,
        )
        # for 'tok', ln-then-pool and pool-then-ln agree on the CLS row
        pooled = _ln_affine(pooled, lnp["scale"], lnp["bias"])
        tokens = None
    else:
        x = x[:, :n_valid]
        if cfg.final_ln_after_pool:
            pooled, tokens = _pool_tokens(x, cfg.pool_type)
            pooled = _ln_affine(pooled, lnp["scale"], lnp["bias"])
        else:
            x = _ln_affine(x, lnp["scale"], lnp["bias"])
            pooled, tokens = _pool_tokens(x, cfg.pool_type)
    pooled = pooled @ p["proj"].astype(dtype)
    pooled = l2_normalize(pooled) if normalize else pooled
    return (pooled, tokens) if output_tokens else pooled


def _cls_only_last_block(
    x: jax.Array,                  # [B, n_pad, D] input to the final block
    bp: Dict[str, Any],            # fp params of the final resblock
    heads: int,
    n_valid: int,
    quick_gelu: bool,
    dtype: Any,
) -> jax.Array:
    """Row-0 (CLS) output of the final residual block, as [B, D].

    With pool_type 'tok' nothing downstream reads the other rows, so the
    final block only needs k/v projections over the full sequence; the
    query, out-projection and MLP run on one row — ~10/12 of the block's
    matmul FLOPs disappear. Plain XLA (k/v proj + tiny attention) instead
    of the fused kernel; numerics match the composable block.
    """
    from .layers import get_act

    b, n, d = x.shape
    hd = d // heads
    h = _ln_affine(x, bp["ln_1"]["scale"], bp["ln_1"]["bias"])
    wq, wk, wv = jnp.split(bp["attn"]["in_proj"]["kernel"].astype(dtype), 3,
                           axis=1)
    bq, bk, bv = jnp.split(bp["attn"]["in_proj"]["bias"].astype(dtype), 3)
    q = h[:, :1] @ wq + bq                       # [B, 1, D]
    k = h @ wk + bk                              # [B, n, D]
    v = h @ wv + bv

    qh = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqc,bhkc->bhqk", qh.astype(jnp.float32) * hd ** -0.5,
        kh.astype(jnp.float32),
    )
    # padded rows carry ln-of-zero garbage in k/v; mask them out of softmax
    key_ok = jnp.arange(n) < n_valid
    logits = jnp.where(key_ok[None, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkc->bhqc", probs, vh.astype(jnp.float32))
    o = o.transpose(0, 2, 1, 3).reshape(b, 1, d).astype(dtype)

    attn_out = o @ bp["attn"]["out_proj"]["kernel"].astype(dtype) \
        + bp["attn"]["out_proj"]["bias"].astype(dtype)
    r = x[:, :1] + attn_out
    t = _ln_affine(r, bp["ln_2"]["scale"], bp["ln_2"]["bias"])
    t = t @ bp["mlp"]["c_fc"]["kernel"].astype(dtype) \
        + bp["mlp"]["c_fc"]["bias"].astype(dtype)
    t = get_act(quick_gelu)(t)
    t = t @ bp["mlp"]["c_proj"]["kernel"].astype(dtype) \
        + bp["mlp"]["c_proj"]["bias"].astype(dtype)
    return (r + t)[:, 0]


def fused_path_available(model) -> bool:
    cfg = model.cfg.vision
    if cfg.tower != "vit":
        return False
    n = _round_up(cfg.num_patches + 1, 16)
    if not fused_block_supported(n, cfg.width, cfg.heads, cfg.mlp_ratio):
        return False
    t = model.cfg.text
    return fused_block_supported(
        _round_up(t.context_length, 16), t.width, t.heads, t.mlp_ratio
    )


def _ln_affine(x, scale, bias, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _pool(x, pool_type: str):
    if pool_type == "avg":
        return x[:, 1:].mean(axis=1)
    if pool_type == "tok":
        return x[:, 0]
    raise NotImplementedError(pool_type)


def _pool_tokens(x, pool_type: str):
    """(pooled, tokens) with the composable VisionTransformer._pool split."""
    if pool_type == "avg":
        return x[:, 1:].mean(axis=1), x[:, 1:]
    if pool_type == "tok":
        return x[:, 0], x[:, 1:]
    return x, x


# -- W8A8 fused serving path -------------------------------------------------


def prepare_int8_tower(
    model, params: Dict[str, Any], calib_images: jax.Array
) -> Dict[str, Any]:
    """Quantize the ViT tower's block projections to int8 and calibrate the
    static activation scales on real images (models/quant.py flow: dynamic
    pass with sown abs-max observations -> per-layer act_scale)."""
    import numpy as np

    from ..models.clip import CLIP
    from ..models.quant import calibrate_act_scales, quantize_dense_tree

    qtree = quantize_dense_tree(jax.device_get(params))
    # plain-XLA attention: calibration is a one-time prep pass that may run
    # on CPU (jax.default_device) where the Pallas kernel can't
    dyn = CLIP(model.cfg, dtype=model.dtype, quant=True,
               attn_impl="reference")
    static = calibrate_act_scales(
        dyn, qtree, [(calib_images,)],
        apply_kwargs={"method": "encode_image"},
    )
    blocks = static["visual"]["transformer"]
    out = {"blocks": []}
    for i in range(model.cfg.vision.layers):
        bp = blocks[f"resblocks_{i}"]
        fp = params["visual"]["transformer"][f"resblocks_{i}"]
        out["blocks"].append({
            "wqkv_q": jnp.asarray(bp["attn"]["in_proj"]["kernel_q"]),
            "sqkv": jnp.asarray(bp["attn"]["in_proj"]["scale"]),
            "bqkv": jnp.asarray(fp["attn"]["in_proj"]["bias"]),
            "wo_q": jnp.asarray(bp["attn"]["out_proj"]["kernel_q"]),
            "so": jnp.asarray(bp["attn"]["out_proj"]["scale"]),
            "bo": jnp.asarray(fp["attn"]["out_proj"]["bias"]),
            "w1_q": jnp.asarray(bp["mlp"]["c_fc"]["kernel_q"]),
            "s1": jnp.asarray(bp["mlp"]["c_fc"]["scale"]),
            "b1": jnp.asarray(fp["mlp"]["c_fc"]["bias"]),
            "w2_q": jnp.asarray(bp["mlp"]["c_proj"]["kernel_q"]),
            "s2": jnp.asarray(bp["mlp"]["c_proj"]["scale"]),
            "b2": jnp.asarray(fp["mlp"]["c_proj"]["bias"]),
            "ln1": jnp.stack([fp["ln_1"]["scale"], fp["ln_1"]["bias"]]),
            "ln2": jnp.stack([fp["ln_2"]["scale"], fp["ln_2"]["bias"]]),
            "act_scales": jnp.asarray(np.stack([
                bp["attn"]["in_proj"]["act_scale"],
                bp["attn"]["out_proj"]["act_scale"],
                bp["mlp"]["c_fc"]["act_scale"],
                bp["mlp"]["c_proj"]["act_scale"],
            ]), jnp.float32),
        })
    return out


def fused_encode_image_int8(
    model,
    params: Dict[str, Any],        # full fp tree (prelude/pool/proj)
    qtower: Dict[str, Any],        # prepare_int8_tower output
    images: jax.Array,
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    cls_fast_last: bool = True,
    output_tokens: bool = False,
) -> jax.Array:
    """encode_image with W8A8 fused block kernels (21.2 ms/layer on v5e vs
    30.6 bf16). Accuracy: validate per checkpoint — calibrated cos > 0.999
    vs bf16 on the calibration distribution. ``output_tokens`` returns
    (pooled, tokens) like the composable path (disables the CLS-only last
    block)."""
    from ..ops.fused_block import fused_block_int8

    cfg = model.cfg.vision
    p = params["visual"]
    b = images.shape[0]

    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"].astype(dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    n_valid = x.shape[1]
    if not cfg.no_ln_pre:
        ln = p["ln_pre"]
        x = _ln_affine(x, ln["scale"], ln["bias"])

    # query rows only need sublane (16) alignment; the kernel zero-pads k/v
    # to the 128-aligned lane count internally (ops/fused_block.py round 2)
    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    # last block in CLS-only form (bf16, from the fp tree — the fp params are
    # on hand either way, and one bf16 row is cheaper than a full int8 block)
    use_cls_fast = cls_fast_last and cfg.pool_type == "tok" \
        and not output_tokens
    q_blocks = qtower["blocks"][:-1] if use_cls_fast else qtower["blocks"]

    for bp in q_blocks:
        x = fused_block_int8(
            x,
            bp["wqkv_q"], bp["sqkv"], bp["bqkv"],
            bp["wo_q"], bp["so"], bp["bo"],
            bp["w1_q"], bp["s1"], bp["b1"],
            bp["w2_q"], bp["s2"], bp["b2"],
            bp["ln1"], bp["ln2"], bp["act_scales"],
            heads=cfg.heads, kv_valid=n_valid,
            quick_gelu=model.cfg.quick_gelu, interpret=interpret,
        )

    lnp = p["ln_post"]
    if use_cls_fast:
        pooled = _cls_only_last_block(
            x, p["transformer"][f"resblocks_{cfg.layers - 1}"], cfg.heads,
            n_valid, model.cfg.quick_gelu, dtype,
        )
        pooled = _ln_affine(pooled, lnp["scale"], lnp["bias"])
        tokens = None
    else:
        x = x[:, :n_valid]
        if cfg.final_ln_after_pool:
            pooled, tokens = _pool_tokens(x, cfg.pool_type)
            pooled = _ln_affine(pooled, lnp["scale"], lnp["bias"])
        else:
            x = _ln_affine(x, lnp["scale"], lnp["bias"])
            pooled, tokens = _pool_tokens(x, cfg.pool_type)
    pooled = pooled @ p["proj"].astype(dtype)
    pooled = l2_normalize(pooled) if normalize else pooled
    return (pooled, tokens) if output_tokens else pooled


def fused_encode_text(
    model,
    params: Dict[str, Any],
    text_ids: jax.Array,           # int [B, ctx]
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """encode_text via fused causal block kernels (77 -> 128 pad)."""
    cfg = model.cfg.text
    p = params["text"]
    x = p["token_embedding"]["embedding"].astype(dtype)[text_ids]
    n_valid = text_ids.shape[1]
    x = x + p["positional_embedding"][:n_valid].astype(dtype)

    # query rows only need sublane (16) alignment; the kernel zero-pads k/v
    # to the 128-aligned lane count internally (ops/fused_block.py round 2)
    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    causal = not cfg.no_causal_mask
    for i in range(cfg.layers):
        bp = p["transformer"][f"resblocks_{i}"]
        x = fused_block(
            x,
            bp["attn"]["in_proj"]["kernel"], bp["attn"]["in_proj"]["bias"],
            bp["attn"]["out_proj"]["kernel"], bp["attn"]["out_proj"]["bias"],
            bp["mlp"]["c_fc"]["kernel"], bp["mlp"]["c_fc"]["bias"],
            bp["mlp"]["c_proj"]["kernel"], bp["mlp"]["c_proj"]["bias"],
            jnp.stack([bp["ln_1"]["scale"], bp["ln_1"]["bias"]]),
            jnp.stack([bp["ln_2"]["scale"], bp["ln_2"]["bias"]]),
            heads=cfg.heads, kv_valid=n_valid,
            quick_gelu=model.cfg.quick_gelu, causal=causal,
            interpret=interpret,
        )
    x = x[:, :n_valid]
    x = _ln_affine(x, p["ln_final"]["scale"], p["ln_final"]["bias"])

    from .text_transformer import text_global_pool

    pooled, _ = text_global_pool(x, text_ids, cfg.pool_type)
    pooled = pooled @ p["text_projection"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled


def prepare_int8_text_tower(
    model, params: Dict[str, Any], calib_ids: jax.Array
) -> Dict[str, Any]:
    """Quantize the text tower's block projections to int8 with static
    activation scales calibrated on real token batches (mirrors
    prepare_int8_tower for the vision side)."""
    import numpy as np

    from ..models.clip import CLIP
    from ..models.quant import calibrate_act_scales, quantize_dense_tree

    qtree = quantize_dense_tree(jax.device_get(params))
    dyn = CLIP(model.cfg, dtype=model.dtype, quant=True,
               attn_impl="reference")
    static = calibrate_act_scales(
        dyn, qtree, [(calib_ids,)],
        apply_kwargs={"method": "encode_text"},
    )
    blocks = static["text"]["transformer"]
    out = {"blocks": []}
    for i in range(model.cfg.text.layers):
        bp = blocks[f"resblocks_{i}"]
        fp = params["text"]["transformer"][f"resblocks_{i}"]
        out["blocks"].append({
            "wqkv_q": jnp.asarray(bp["attn"]["in_proj"]["kernel_q"]),
            "sqkv": jnp.asarray(bp["attn"]["in_proj"]["scale"]),
            "bqkv": jnp.asarray(fp["attn"]["in_proj"]["bias"]),
            "wo_q": jnp.asarray(bp["attn"]["out_proj"]["kernel_q"]),
            "so": jnp.asarray(bp["attn"]["out_proj"]["scale"]),
            "bo": jnp.asarray(fp["attn"]["out_proj"]["bias"]),
            "w1_q": jnp.asarray(bp["mlp"]["c_fc"]["kernel_q"]),
            "s1": jnp.asarray(bp["mlp"]["c_fc"]["scale"]),
            "b1": jnp.asarray(fp["mlp"]["c_fc"]["bias"]),
            "w2_q": jnp.asarray(bp["mlp"]["c_proj"]["kernel_q"]),
            "s2": jnp.asarray(bp["mlp"]["c_proj"]["scale"]),
            "b2": jnp.asarray(fp["mlp"]["c_proj"]["bias"]),
            "ln1": jnp.stack([fp["ln_1"]["scale"], fp["ln_1"]["bias"]]),
            "ln2": jnp.stack([fp["ln_2"]["scale"], fp["ln_2"]["bias"]]),
            "act_scales": jnp.asarray(np.stack([
                bp["attn"]["in_proj"]["act_scale"],
                bp["attn"]["out_proj"]["act_scale"],
                bp["mlp"]["c_fc"]["act_scale"],
                bp["mlp"]["c_proj"]["act_scale"],
            ]), jnp.float32),
        })
    return out


def fused_encode_text_int8(
    model,
    params: Dict[str, Any],        # full fp tree (embeddings/ln_final/proj)
    qtower: Dict[str, Any],        # prepare_int8_text_tower output
    text_ids: jax.Array,
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """encode_text with W8A8 fused causal block kernels."""
    from ..ops.fused_block import fused_block_int8

    cfg = model.cfg.text
    p = params["text"]
    x = p["token_embedding"]["embedding"].astype(dtype)[text_ids]
    n_valid = text_ids.shape[1]
    x = x + p["positional_embedding"][:n_valid].astype(dtype)

    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    causal = not cfg.no_causal_mask
    for bp in qtower["blocks"]:
        x = fused_block_int8(
            x,
            bp["wqkv_q"], bp["sqkv"], bp["bqkv"],
            bp["wo_q"], bp["so"], bp["bo"],
            bp["w1_q"], bp["s1"], bp["b1"],
            bp["w2_q"], bp["s2"], bp["b2"],
            bp["ln1"], bp["ln2"], bp["act_scales"],
            heads=cfg.heads, kv_valid=n_valid, causal=causal,
            quick_gelu=model.cfg.quick_gelu, interpret=interpret,
        )
    x = x[:, :n_valid]
    x = _ln_affine(x, p["ln_final"]["scale"], p["ln_final"]["bias"])

    from .text_transformer import text_global_pool

    pooled, _ = text_global_pool(x, text_ids, cfg.pool_type)
    pooled = pooled @ p["text_projection"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled


# -- SigLIP fused serving ----------------------------------------------------


def siglip_fused_available(vision_cfg) -> bool:
    """Shapes the fused kernel handles for a SigLIP vision tower."""
    n = _round_up((vision_cfg.image_size // vision_cfg.patch_size) ** 2, 16)
    return fused_block_supported(
        n, vision_cfg.width, vision_cfg.heads,
        vision_cfg.intermediate_size / vision_cfg.width,
    )


def fused_encode_image_siglip(
    model,                         # models.siglip.Siglip
    params: Dict[str, Any],
    images: jax.Array,
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Siglip.encode_image via fused block kernels.

    The SigLIP block (models/siglip.py SiglipBlock) is a pre-LN stack with a
    packed qkv in_proj — the same contract as ops/fused_block.py, with
    tanh-GELU MLPs and eps=1e-6. There is no CLS token; every token feeds
    the MAP head, which runs as a small XLA epilogue (one probe query).
    """
    from .siglip import SiglipMAPHead, tanh_gelu  # noqa: F401

    cfg = model.cfg.vision
    p = params["vision_model"]
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"].astype(dtype) \
        + p["patch_embed"]["bias"].astype(dtype)
    x = x + p["position_embedding"].astype(dtype)
    n_valid = x.shape[1]

    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    for i in range(cfg.layers):
        bp = p[f"blocks_{i}"]
        x = fused_block(
            x,
            bp["in_proj"]["kernel"], bp["in_proj"]["bias"],
            bp["out_proj"]["kernel"], bp["out_proj"]["bias"],
            bp["fc1"]["kernel"], bp["fc1"]["bias"],
            bp["fc2"]["kernel"], bp["fc2"]["bias"],
            jnp.stack([bp["ln_1"]["scale"], bp["ln_1"]["bias"]]),
            jnp.stack([bp["ln_2"]["scale"], bp["ln_2"]["bias"]]),
            heads=cfg.heads, kv_valid=n_valid, act="tanh",
            ln_eps=cfg.layer_norm_eps, interpret=interpret,
        )
    x = x[:, :n_valid]
    x = _ln_affine(x, p["post_layernorm"]["scale"],
                   p["post_layernorm"]["bias"], eps=cfg.layer_norm_eps)

    # MAP-head epilogue (XLA): probe attention over all tokens + MLP
    head = SiglipMAPHead(
        cfg.width, cfg.heads, cfg.intermediate_size, cfg.layer_norm_eps,
        dtype=dtype,
    )
    pooled = head.apply({"params": p["head"]}, x)
    return l2_normalize(pooled) if normalize else pooled


def fused_encode_text_siglip(
    model,                         # models.siglip.Siglip
    params: Dict[str, Any],
    input_ids: jax.Array,          # int [B, ctx<=64]
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Siglip.encode_text via fused block kernels (bidirectional attention,
    tanh-GELU, eps=1e-6; pooled = LAST token -> head projection)."""
    cfg = model.cfg.text
    p = params["text_model"]
    x = p["token_embedding"]["embedding"].astype(dtype)[input_ids]
    n_valid = input_ids.shape[1]
    x = x + p["position_embedding"][:n_valid].astype(dtype)

    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    for i in range(cfg.layers):
        bp = p[f"blocks_{i}"]
        x = fused_block(
            x,
            bp["in_proj"]["kernel"], bp["in_proj"]["bias"],
            bp["out_proj"]["kernel"], bp["out_proj"]["bias"],
            bp["fc1"]["kernel"], bp["fc1"]["bias"],
            bp["fc2"]["kernel"], bp["fc2"]["bias"],
            jnp.stack([bp["ln_1"]["scale"], bp["ln_1"]["bias"]]),
            jnp.stack([bp["ln_2"]["scale"], bp["ln_2"]["bias"]]),
            heads=cfg.heads, kv_valid=n_valid, act="tanh",
            ln_eps=cfg.layer_norm_eps, interpret=interpret,
        )
    x = _ln_affine(x[:, n_valid - 1], p["final_layer_norm"]["scale"],
                   p["final_layer_norm"]["bias"], eps=cfg.layer_norm_eps)
    pooled = x @ p["head"]["kernel"].astype(dtype) \
        + p["head"]["bias"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled


def prepare_int8_siglip_text_tower(
    model, params: Dict[str, Any], calib_ids: jax.Array
) -> Dict[str, Any]:
    """Quantize the SigLIP text tower's block projections to int8 with
    static calibrated activation scales (mirrors prepare_int8_siglip_tower
    via method='encode_text')."""
    import numpy as np

    from ..models.quant import calibrate_act_scales, quantize_dense_tree
    from ..models.siglip import Siglip

    p = jax.device_get(params)
    tp = dict(p["text_model"])
    n_layers = model.cfg.text.layers
    for i in range(n_layers):
        tp[f"blocks_{i}"] = quantize_dense_tree(tp[f"blocks_{i}"])
    qparams = dict(p, text_model=tp)
    dyn = Siglip(model.cfg, dtype=model.dtype, quant=True,
                 attn_impl="reference")
    static = calibrate_act_scales(
        dyn, qparams, [(calib_ids,)],
        apply_kwargs={"method": "encode_text"},
    )
    blocks = static["text_model"]
    fp_blocks = p["text_model"]
    out = {"blocks": []}
    for i in range(n_layers):
        bp = blocks[f"blocks_{i}"]
        fp = fp_blocks[f"blocks_{i}"]
        out["blocks"].append({
            "wqkv_q": jnp.asarray(bp["in_proj"]["kernel_q"]),
            "sqkv": jnp.asarray(bp["in_proj"]["scale"]),
            "bqkv": jnp.asarray(fp["in_proj"]["bias"]),
            "wo_q": jnp.asarray(bp["out_proj"]["kernel_q"]),
            "so": jnp.asarray(bp["out_proj"]["scale"]),
            "bo": jnp.asarray(fp["out_proj"]["bias"]),
            "w1_q": jnp.asarray(bp["fc1"]["kernel_q"]),
            "s1": jnp.asarray(bp["fc1"]["scale"]),
            "b1": jnp.asarray(fp["fc1"]["bias"]),
            "w2_q": jnp.asarray(bp["fc2"]["kernel_q"]),
            "s2": jnp.asarray(bp["fc2"]["scale"]),
            "b2": jnp.asarray(fp["fc2"]["bias"]),
            "ln1": jnp.stack([fp["ln_1"]["scale"], fp["ln_1"]["bias"]]),
            "ln2": jnp.stack([fp["ln_2"]["scale"], fp["ln_2"]["bias"]]),
            "act_scales": jnp.asarray(np.stack([
                bp["in_proj"]["act_scale"],
                bp["out_proj"]["act_scale"],
                bp["fc1"]["act_scale"],
                bp["fc2"]["act_scale"],
            ]), jnp.float32),
        })
    return out


def fused_encode_text_siglip_int8(
    model,
    params: Dict[str, Any],        # full fp tree (embeds/final LN/head)
    qtower: Dict[str, Any],        # prepare_int8_siglip_text_tower output
    input_ids: jax.Array,
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Siglip.encode_text with W8A8 fused block kernels."""
    from ..ops.fused_block import fused_block_int8

    cfg = model.cfg.text
    p = params["text_model"]
    x = p["token_embedding"]["embedding"].astype(dtype)[input_ids]
    n_valid = input_ids.shape[1]
    x = x + p["position_embedding"][:n_valid].astype(dtype)

    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    for bp in qtower["blocks"]:
        x = fused_block_int8(
            x,
            bp["wqkv_q"], bp["sqkv"], bp["bqkv"],
            bp["wo_q"], bp["so"], bp["bo"],
            bp["w1_q"], bp["s1"], bp["b1"],
            bp["w2_q"], bp["s2"], bp["b2"],
            bp["ln1"], bp["ln2"], bp["act_scales"],
            heads=cfg.heads, kv_valid=n_valid, act="tanh",
            ln_eps=cfg.layer_norm_eps, interpret=interpret,
        )
    x = _ln_affine(x[:, n_valid - 1], p["final_layer_norm"]["scale"],
                   p["final_layer_norm"]["bias"], eps=cfg.layer_norm_eps)
    pooled = x @ p["head"]["kernel"].astype(dtype) \
        + p["head"]["bias"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled


def prepare_int8_siglip_tower(
    model, params: Dict[str, Any], calib_images: jax.Array
) -> Dict[str, Any]:
    """Quantize the SigLIP vision tower's block projections to int8 and
    calibrate static activation scales (mirrors prepare_int8_tower; the
    patchify projection and MAP head stay fp — they are a rounding error of
    the FLOPs and the head feeds the final embedding directly)."""
    import numpy as np

    from ..models.quant import calibrate_act_scales, quantize_dense_tree
    from ..models.siglip import Siglip

    p = jax.device_get(params)
    vp = dict(p["vision_model"])
    n_layers = model.cfg.vision.layers
    for i in range(n_layers):
        vp[f"blocks_{i}"] = quantize_dense_tree(vp[f"blocks_{i}"])
    qparams = dict(p, vision_model=vp)
    dyn = Siglip(model.cfg, dtype=model.dtype, quant=True,
                 attn_impl="reference")
    static = calibrate_act_scales(
        dyn, qparams, [(calib_images,)],
        apply_kwargs={"method": "encode_image"},
    )
    blocks = static["vision_model"]
    fp_blocks = p["vision_model"]
    out = {"blocks": []}
    for i in range(n_layers):
        bp = blocks[f"blocks_{i}"]
        fp = fp_blocks[f"blocks_{i}"]
        out["blocks"].append({
            "wqkv_q": jnp.asarray(bp["in_proj"]["kernel_q"]),
            "sqkv": jnp.asarray(bp["in_proj"]["scale"]),
            "bqkv": jnp.asarray(fp["in_proj"]["bias"]),
            "wo_q": jnp.asarray(bp["out_proj"]["kernel_q"]),
            "so": jnp.asarray(bp["out_proj"]["scale"]),
            "bo": jnp.asarray(fp["out_proj"]["bias"]),
            "w1_q": jnp.asarray(bp["fc1"]["kernel_q"]),
            "s1": jnp.asarray(bp["fc1"]["scale"]),
            "b1": jnp.asarray(fp["fc1"]["bias"]),
            "w2_q": jnp.asarray(bp["fc2"]["kernel_q"]),
            "s2": jnp.asarray(bp["fc2"]["scale"]),
            "b2": jnp.asarray(fp["fc2"]["bias"]),
            "ln1": jnp.stack([fp["ln_1"]["scale"], fp["ln_1"]["bias"]]),
            "ln2": jnp.stack([fp["ln_2"]["scale"], fp["ln_2"]["bias"]]),
            "act_scales": jnp.asarray(np.stack([
                bp["in_proj"]["act_scale"],
                bp["out_proj"]["act_scale"],
                bp["fc1"]["act_scale"],
                bp["fc2"]["act_scale"],
            ]), jnp.float32),
        })
    return out


def fused_encode_image_siglip_int8(
    model,                         # models.siglip.Siglip
    params: Dict[str, Any],        # full fp tree (patchify/pos/LN/head)
    qtower: Dict[str, Any],        # prepare_int8_siglip_tower output
    images: jax.Array,
    normalize: bool = True,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Siglip.encode_image with W8A8 fused block kernels (tanh-GELU,
    eps=1e-6); MAP-head epilogue stays fp like the bf16 fused path."""
    from ..ops.fused_block import fused_block_int8
    from .siglip import SiglipMAPHead

    cfg = model.cfg.vision
    p = params["vision_model"]
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"].astype(dtype) \
        + p["patch_embed"]["bias"].astype(dtype)
    x = x + p["position_embedding"].astype(dtype)
    n_valid = x.shape[1]

    align = 8 if interpret else 16
    n_pad = _round_up(n_valid, align)
    if n_pad != n_valid:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n_valid), (0, 0)])

    for bp in qtower["blocks"]:
        x = fused_block_int8(
            x,
            bp["wqkv_q"], bp["sqkv"], bp["bqkv"],
            bp["wo_q"], bp["so"], bp["bo"],
            bp["w1_q"], bp["s1"], bp["b1"],
            bp["w2_q"], bp["s2"], bp["b2"],
            bp["ln1"], bp["ln2"], bp["act_scales"],
            heads=cfg.heads, kv_valid=n_valid, act="tanh",
            ln_eps=cfg.layer_norm_eps, interpret=interpret,
        )
    x = x[:, :n_valid]
    x = _ln_affine(x, p["post_layernorm"]["scale"],
                   p["post_layernorm"]["bias"], eps=cfg.layer_norm_eps)

    head = SiglipMAPHead(
        cfg.width, cfg.heads, cfg.intermediate_size, cfg.layer_norm_eps,
        dtype=dtype,
    )
    pooled = head.apply({"params": p["head"]}, x)
    return l2_normalize(pooled) if normalize else pooled
