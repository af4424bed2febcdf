"""Round-3: MXU-side levers for the int8 fused block.

exp_fastattn3's nulls (fold/lsum/pbf16/noclamp all within noise) say the
VPU passes are hidden behind MXU time — the kernel is matmul-bound. The
remaining levers are therefore MXU-efficiency ones:

  base     — shipped kernel math (per-row chain, rows=4). ~16.8 ms/layer.
  bqkv     — batch LN1+quantize+qkv across the rows dim: one
             [rows*592, d] x [d, 3d] int8 matmul instead of `rows`
             [592, d] matmuls. M=2368 pads MXU tiles ~2.7% vs ~8% at 592.
             Attention + the rest stay per-row.
  bproj    — bqkv + batched out-projection ([rows*592, d] x [d, d]);
             attention outputs are accumulated into a rows-long list
             first. MLP stays per-row (its int32 acc at M=2368 is ~39 MB
             VMEM — risky).
  bmlp     — bproj + batched MLP (both matmuls at M=rows*592). VMEM
             pressure probe: may fail to fit; that result is the point.
  exp2     — jnp.exp2((log2 e) * t) instead of jnp.exp(t): probes whether
             Mosaic's exp2 lowering is cheaper than exp (exp is lowered
             via exp2 + a multiply on most VPUs; doing the multiply in
             the same fused expression may save a pass).

Numerics: every variant reports max|y - y_base| and cosine vs base.
bqkv/bproj/bmlp are exact re-associations (same math, same order per
element) — expect cos=1.0 up to accumulation-order noise.

Run: python perf/experiments/exp_fastattn4.py [variant ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from clip_embeds_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

NEG_INF = -1e30
B, D, H = 256, 1024, 16
HD = D // H
L = 24
KV_VALID = 577
MLP = 4 * D
CLAMP = 75.0
SCALE = HD ** -0.5
N_Q, N_KV = 592, 640
LOG2E = 1.4426950408889634


def _ln(x, g, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g.astype(jnp.float32) \
        + b.astype(jnp.float32)


def _q(x32):
    return jnp.clip(jnp.round(x32), -127, 127).astype(jnp.int8)


def _idot(xq, w):
    return jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _attn(qkv, brow, d, dtype, exp2):
    """Per-sequence attention on a [n, 3d] qkv block; returns [n, d]."""
    n = qkv.shape[0]
    pad = jnp.zeros((N_KV - n, 2 * d), dtype)
    kv = jnp.concatenate([qkv[:, d:], pad], axis=0)
    outs = []
    for g in range(H):
        q = qkv[:, g * HD:(g + 1) * HD]
        k = kv[:, g * HD:(g + 1) * HD]
        v = kv[:, d + g * HD:d + (g + 1) * HD]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * SCALE
        t = jnp.minimum(s + brow, CLAMP)
        p = jnp.exp2(LOG2E * t) if exp2 else jnp.exp(t)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l).astype(dtype))
    return jnp.concatenate(outs, axis=-1)


def _kernel(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    g1_ref, lb1_ref, g2_ref, lb2_ref, a_ref, brow_ref, o_ref,
    *, rows, bqkv, bproj, bmlp, exp2,
):
    a = a_ref[0]
    brow = brow_ref[0:1, 0, :]
    d = x_ref.shape[-1]
    dtype = x_ref.dtype

    def mlp_of(x):
        h = _ln(x, g2_ref[0], lb2_ref[0])
        xq = _q(h / a[2])
        acc1 = _idot(xq, w1_ref[...]).astype(jnp.float32)
        m1 = acc1 * (a[2] * s1_ref[0]) + b1_ref[0]
        t2 = m1 * jax.nn.sigmoid(1.702 * m1)
        mq = _q(t2 / a[3])
        return (_idot(mq, w2_ref[...]).astype(jnp.float32)
                * (a[3] * s2_ref[0]) + b2_ref[0]).astype(dtype)

    if bqkv or bproj or bmlp:
        n = x_ref.shape[1]
        xf = x_ref[...].reshape(rows * n, d)
        h = _ln(xf, g1_ref[0], lb1_ref[0])
        xq = _q(h / a[0])
        qkv = (_idot(xq, wqkv_ref[...]).astype(jnp.float32)
               * (a[0] * sqkv_ref[0])
               + bqkv_ref[0]).astype(dtype)
        atts = [
            _attn(qkv[r * n:(r + 1) * n], brow, d, dtype, exp2)
            for r in range(rows)
        ]
        if bproj or bmlp:
            att = jnp.concatenate(atts, axis=0)
            aq = _q(att.astype(jnp.float32) / a[1])
            xf = xf + (_idot(aq, wo_ref[...]).astype(jnp.float32)
                       * (a[1] * so_ref[0]) + bo_ref[0]).astype(dtype)
            if bmlp:
                xf = xf + mlp_of(xf)
                o_ref[...] = xf.reshape(rows, n, d)
            else:
                for r in range(rows):
                    x = xf[r * n:(r + 1) * n]
                    o_ref[r] = x + mlp_of(x)
        else:
            for r in range(rows):
                att = atts[r]
                aq = _q(att.astype(jnp.float32) / a[1])
                x = x_ref[r] + (_idot(aq, wo_ref[...]).astype(jnp.float32)
                                * (a[1] * so_ref[0])
                                + bo_ref[0]).astype(dtype)
                o_ref[r] = x + mlp_of(x)
        return

    for r in range(rows):
        x = x_ref[r]
        h = _ln(x, g1_ref[0], lb1_ref[0])
        xq = _q(h / a[0])
        qkv = (_idot(xq, wqkv_ref[...]).astype(jnp.float32)
               * (a[0] * sqkv_ref[0])
               + bqkv_ref[0]).astype(dtype)
        att = _attn(qkv, brow, d, dtype, exp2)
        aq = _q(att.astype(jnp.float32) / a[1])
        x = x + (_idot(aq, wo_ref[...]).astype(jnp.float32)
                 * (a[1] * so_ref[0]) + bo_ref[0]).astype(dtype)
        o_ref[r] = x + mlp_of(x)


def fused_block_v(x, p, rows, **flags):
    b, n, d = x.shape

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, **flags),
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, n, d), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)), const((1, d)),
            const((d, MLP)), const((1, MLP)), const((1, MLP)),
            const((MLP, d)), const((1, d)), const((1, d)),
            const((1, d)), const((1, d)), const((1, d)), const((1, d)),
            const((1, 4)),
            const((1, 1, N_KV)),
        ],
        out_specs=pl.BlockSpec((rows, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # batched variants hold a [rows*592, 3d] int32 acc + fp32 qkv —
            # 117 MB at rows=4 (measured OOM at the shipped 110 MB limit);
            # 120 MB still leaves headroom under the 128 MB v5e VMEM
            vmem_limit_bytes=(120 if (flags.get("bqkv") or flags.get("bproj")
                                      or flags.get("bmlp")) else 110)
            * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * N_KV * d),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * H * n * N_KV,
        ),
    )(x, p["wqkv_q"], p["sqkv"], p["bqkv"], p["wo_q"], p["so"], p["bo"],
      p["w1_q"], p["s1"], p["b1"], p["w2_q"], p["s2"], p["b2"],
      p["g1"], p["lb1"], p["g2"], p["lb2"],
      p["ascale"], p["brow"])


def quantize(w):
    w = np.asarray(w, np.float32)
    s = np.abs(w).max(axis=0) / 127.0
    s = np.where(s == 0, 1.0, s)
    q = np.clip(np.rint(w / s), -127, 127)
    return jnp.asarray(q, jnp.int8), jnp.asarray(s, jnp.float32)


def make_params(key, l=L):
    ks = jax.random.split(key, l * 4)
    sc = 0.02
    out = []
    a = np.asarray([0.04, 0.01, 0.04, 0.02], np.float32)
    brow = np.where(np.arange(N_KV) < KV_VALID, 0.0, NEG_INF) - 12.0
    for i in range(l):
        p = {}
        p["wqkv_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i], (D, 3 * D))) * sc)
        p["sqkv"] = s.reshape(1, -1)
        p["bqkv"] = jnp.zeros((1, 3 * D), jnp.float32)
        p["wo_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i + 1], (D, D))) * sc)
        p["so"] = s.reshape(1, -1)
        p["bo"] = jnp.zeros((1, D), jnp.float32)
        p["w1_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i + 2], (D, MLP))) * sc)
        p["s1"] = s.reshape(1, -1)
        p["b1"] = jnp.zeros((1, MLP), jnp.float32)
        p["w2_q"], s = quantize(
            np.asarray(jax.random.normal(ks[4 * i + 3], (MLP, D))) * sc)
        p["s2"] = s.reshape(1, -1)
        p["b2"] = jnp.zeros((1, D), jnp.float32)
        p["g1"] = jnp.ones((1, D), jnp.float32)
        p["lb1"] = jnp.zeros((1, D), jnp.float32)
        p["g2"] = jnp.ones((1, D), jnp.float32)
        p["lb2"] = jnp.zeros((1, D), jnp.float32)
        p["ascale"] = jnp.asarray(a).reshape(1, 4)
        p["brow"] = jnp.asarray(brow, jnp.float32).reshape(1, 1, -1)
        out.append(p)
    return out


def _time_loop(fn, *args, iters=10):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(args, iters):
        def body(_, salt):
            out = fn(*args, salt)
            return out.reshape(-1)[0].astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))

    float(loop(args, 1))
    float(loop(args, iters))
    t0 = time.perf_counter(); float(loop(args, 1))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(args, iters))
    tl = time.perf_counter() - t0
    return (tl - ts) / (iters - 1)


FLAG_SETS = {
    "base": dict(bqkv=False, bproj=False, bmlp=False, exp2=False),
    "bqkv": dict(bqkv=True, bproj=False, bmlp=False, exp2=False),
    "bproj": dict(bqkv=True, bproj=True, bmlp=False, exp2=False),
    "bmlp": dict(bqkv=True, bproj=True, bmlp=True, exp2=False),
    "exp2": dict(bqkv=False, bproj=False, bmlp=False, exp2=True),
    "bproj2": dict(bqkv=True, bproj=True, bmlp=False, exp2=True),
}

_ref_out = {}


def bench(name, rows=4):
    flags = FLAG_SETS[name]
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N_Q, D),
                          jnp.bfloat16) * 0.5

    def model(params, x, salt):
        x = x + salt.astype(x.dtype)
        for p in params:
            x = fused_block_v(x, p, rows=rows, **flags)
        return x

    y = np.asarray(jax.jit(model)(
        params[:2], x[:8], jnp.asarray(0.0)).astype(jnp.float32))
    if name == "base":
        _ref_out["y"] = y
    elif "y" in _ref_out:
        ref = _ref_out["y"]
        cos = float((y * ref).sum()
                    / (np.linalg.norm(y) * np.linalg.norm(ref)))
        err = float(np.abs(y - ref).max())
        print(f"{name:8s}: numerics vs base cos={cos:.6f} "
              f"maxerr={err:.4f}", flush=True)

    per = _time_loop(model, params, x)
    print(f"{name:8s}: {per * 1000 / L:6.2f} ms/layer "
          f"-> blocks-only {B / per:,.0f} img/s", flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["base", "bqkv", "bproj", "bmlp", "exp2"]
    for v in variants:
        # "name:R" runs the variant at R sequences per program (default 4)
        name, _, r = v.partition(":")
        try:
            bench(name, rows=int(r) if r else 4)
        except Exception as e:
            print(f"{v:8s}: FAILED {type(e).__name__}: {e}", flush=True)
