"""Round-3: attack the ~3.7 ms/layer VPU gap in the int8 fused block.

exp_headpair/exp_attnphases pinned the residual gap to the int8 matmul
floor (~13 ms/layer) on VPU elementwise passes, not MXU scheduling:
fp32 exp over 16x[592,640], the separate softmax l-sum reduction (same
size), the 3 quantize round/clip/divide passes, and the per-head o/l
divides. Variants here try to delete those passes without touching the
matmul structure (all int8 weights, bf16 attention matmuls, rows=4,
n_q=592, n_kv=640 — the shipped fused_block_int8 configuration):

  base    — shipped kernel math (clamped no-max softmax, separate l-sum,
            divide-then-round quantize). Expect ~16.8 ms/layer.
  lsum    — fold the softmax denominator into the PV matmul: v gains a
            ones-column ([n_kv,65]), so o_ext = p @ v_ext computes both
            o and l in one MXU op; the separate jnp.sum pass over
            [592,640] fp32 per head disappears. o/l becomes
            o * recip(l) (recip is [592,1], the mul was always there).
  fold    — fold every quantize divide into existing affine math:
            * LN gamma/beta pre-divided by the activation scale
              (quantize = round(clip(ln_out)), no divide pass),
            * QuickGELU: m1' = acc*(a_in*s1/a_out) via the dequant scale,
              then QG(m1)/a_out == m1' * sigmoid(1.702*a_out*m1') —
              the divide folds into the sigmoid constant,
            * attention out: o * (1/(l*a_attn)) — pre-divided by the
              act scale during the (already present) normalization mul.
  pbf16   — store softmax p as bf16 straight out of the exp (halves the
            p write + PV read traffic in VMEM).
  all     — lsum + fold + pbf16.
  allnc   — all + drop the +75 overflow clamp (pass-count upper bound;
            not shippable as-is, the clamp is the no-max safety net).
  int8pv  — all + int8 PV matmul: p is scaled by a static per-head
            constant into int8 (p in [0, e^C] after the -C_LOGIT shift),
            v quantized per-head static; requant of p rides the exp
            epilogue. (VERDICT r2 asked for the measurement with static
            scales; the round-2 dynamic version was a wash.)

Numerics: every variant reports max|y - y_base| and cosine vs base.

Run: python perf/experiments/exp_fastattn3.py [variant ...]
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


def _ln(x, g, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g.astype(jnp.float32) \
        + b.astype(jnp.float32)


def _q(x32):
    return jnp.clip(jnp.round(x32), -127, 127).astype(jnp.int8)


def _idot(xq, w_ref):
    return jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _kernel(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    g1_ref, lb1_ref, g2_ref, lb2_ref, a_ref, brow_ref, vs_ref, o_ref,
    *, rows, lsum, fold, pbf16, noclamp, int8pv, sbf16=False,
    projonly=False, noexp=False, int8qk=False,
):
    for r in range(rows):
        x = x_ref[r]
        n, d = x.shape
        a = a_ref[0]

        # --- LN1 + quantize + qkv projection --------------------------------
        h = _ln(x, g1_ref[0], lb1_ref[0])
        xq = _q(h) if fold else _q(h / a[0])
        qkv = (_idot(xq, wqkv_ref).astype(jnp.float32)
               * (a[0] * sqkv_ref[0])
               + bqkv_ref[0]).astype(x.dtype)

        n_kv = N_KV
        pad = jnp.zeros((n_kv - n, 2 * d), x.dtype)
        kv = jnp.concatenate([qkv[:, d:], pad], axis=0)
        brow = brow_ref[0:1, 0, :]

        # --- attention -------------------------------------------------------
        if projonly:
            # decomposition probe: skip the attention math entirely; the
            # q third of qkv stands in for att so the out-projection still
            # consumes a live [n, d] operand (Mosaic cannot DCE the rest of
            # the chain). base - projonly == attention phase cost.
            att = qkv[:, :d]
            aq = _q(att.astype(jnp.float32) / a[1])
            x = x + (_idot(aq, wo_ref).astype(jnp.float32)
                     * (a[1] * so_ref[0]) + bo_ref[0]).astype(x.dtype)
            h = _ln(x, g2_ref[0], lb2_ref[0])
            xq = _q(h / a[2])
            acc1 = _idot(xq, w1_ref).astype(jnp.float32)
            m1 = acc1 * (a[2] * s1_ref[0]) + b1_ref[0]
            t2 = m1 * jax.nn.sigmoid(1.702 * m1)
            mq = _q(t2 / a[3])
            x = x + (_idot(mq, w2_ref).astype(jnp.float32)
                     * (a[3] * s2_ref[0]) + b2_ref[0]).astype(x.dtype)
            o_ref[r] = x
            continue
        outs = []
        for g in range(H):
            q = qkv[:, g * HD:(g + 1) * HD]
            k = kv[:, g * HD:(g + 1) * HD]
            v = kv[:, d + g * HD:d + (g + 1) * HD]
            if int8qk:
                # int8 logits matmul: dynamic per-head scales are cheap
                # here (maxabs over [n,64], tiny vs the [n,n_kv] passes);
                # a shipped kernel would calibrate them statically.
                q32 = q.astype(jnp.float32)
                k32 = k.astype(jnp.float32)
                qs = jnp.max(jnp.abs(q32)) * (1.0 / 127.0) + 1e-12
                ks = jnp.max(jnp.abs(k32)) * (1.0 / 127.0) + 1e-12
                qq = _q(q32 / qs)
                kq = _q(k32 / ks)
                s = jax.lax.dot_general(
                    qq, kq, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (qs * ks * SCALE)
                t = jnp.minimum(s + brow, CLAMP)
                p = jnp.exp(t)
            elif sbf16:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                ) * jnp.bfloat16(SCALE)
                t = jnp.minimum(s + brow.astype(jnp.bfloat16),
                                jnp.bfloat16(CLAMP))
                p = jnp.exp(t)
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * SCALE
                t = (s + brow) if noclamp else jnp.minimum(s + brow, CLAMP)
                p = t if noexp else jnp.exp(t)
            if pbf16 and p.dtype != jnp.bfloat16:
                p = p.astype(jnp.bfloat16)
            if int8pv:
                # static per-head p scale: p in [0, e^C]; vs_ref carries
                # the per-head v scales
                pq = jnp.clip(jnp.round(p.astype(jnp.float32)
                                        * (127.0 / 8.0)),
                              0, 127).astype(jnp.int8)
                vq = jnp.clip(jnp.round(v.astype(jnp.float32)
                                        / vs_ref[0, g]),
                              -127, 127).astype(jnp.int8)
                o_ext = jax.lax.dot_general(
                    pq, vq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (vs_ref[0, g] * (8.0 / 127.0))
                l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                o = o_ext
            elif lsum:
                ones = jnp.ones((n_kv, 1), p.dtype)
                v_ext = jnp.concatenate([v.astype(p.dtype), ones], axis=1)
                o_ext = jax.lax.dot_general(
                    p, v_ext, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = o_ext[:, :HD]
                l = o_ext[:, HD:HD + 1]
            else:
                l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(x.dtype) if not pbf16 else p, v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if fold:
                outs.append(o * (1.0 / (l * a[1])))
            else:
                outs.append((o / l).astype(x.dtype))

        att = jnp.concatenate(outs, axis=-1)
        if fold:
            aq = _q(att)          # att already pre-divided by a[1]
        else:
            aq = _q(att.astype(jnp.float32) / a[1])
        x = x + (_idot(aq, wo_ref).astype(jnp.float32)
                 * (a[1] * so_ref[0]) + bo_ref[0]).astype(x.dtype)

        # --- MLP --------------------------------------------------------------
        h = _ln(x, g2_ref[0], lb2_ref[0])
        xq = _q(h) if fold else _q(h / a[2])
        acc1 = _idot(xq, w1_ref).astype(jnp.float32)
        if fold:
            # m1' = m1 / a[3]; QG(m1)/a[3] == m1' * sigmoid(1.702*a[3]*m1')
            m1p = acc1 * (a[2] * s1_ref[0] / a[3]) + b1_ref[0] / a[3]
            t = m1p * jax.nn.sigmoid((1.702 * a[3]) * m1p)
            mq = _q(t)
        else:
            m1 = acc1 * (a[2] * s1_ref[0]) + b1_ref[0]
            t = m1 * jax.nn.sigmoid(1.702 * m1)
            mq = _q(t / a[3])
        x = x + (_idot(mq, w2_ref).astype(jnp.float32)
                 * (a[3] * s2_ref[0]) + b2_ref[0]).astype(x.dtype)
        o_ref[r] = x


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
            const((1, H)),
        ],
        out_specs=pl.BlockSpec((rows, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (12 * d * d + 2 * N_KV * d),
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * H * n * N_KV,
        ),
    )(x, p["wqkv_q"], p["sqkv"], p["bqkv"], p["wo_q"], p["so"], p["bo"],
      p["w1_q"], p["s1"], p["b1"], p["w2_q"], p["s2"], p["b2"],
      p["g1"], p["lb1"], p["g2"], p["lb2"],
      p["ascale"], p["brow"], p["vscale"])


def quantize(w):
    w = np.asarray(w, np.float32)
    s = np.abs(w).max(axis=0) / 127.0
    s = np.where(s == 0, 1.0, s)
    q = np.clip(np.rint(w / s), -127, 127)
    return jnp.asarray(q, jnp.int8), jnp.asarray(s, jnp.float32)


def make_params(key, fold, l=L):
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
        g1 = np.ones((D,), np.float32)
        g2 = np.ones((D,), np.float32)
        lb = np.zeros((D,), np.float32)
        if fold:
            p["g1"] = jnp.asarray(g1 / a[0]).reshape(1, -1)
            p["lb1"] = jnp.asarray(lb / a[0]).reshape(1, -1)
            p["g2"] = jnp.asarray(g2 / a[2]).reshape(1, -1)
            p["lb2"] = jnp.asarray(lb / a[2]).reshape(1, -1)
        else:
            p["g1"] = jnp.asarray(g1).reshape(1, -1)
            p["lb1"] = jnp.asarray(lb).reshape(1, -1)
            p["g2"] = jnp.asarray(g2).reshape(1, -1)
            p["lb2"] = jnp.asarray(lb).reshape(1, -1)
        p["ascale"] = jnp.asarray(a).reshape(1, 4)
        p["brow"] = jnp.asarray(brow, jnp.float32).reshape(1, 1, -1)
        p["vscale"] = jnp.full((1, H), 0.05, jnp.float32)
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
    "base": dict(lsum=False, fold=False, pbf16=False, noclamp=False,
                 int8pv=False),
    "lsum": dict(lsum=True, fold=False, pbf16=False, noclamp=False,
                 int8pv=False),
    "fold": dict(lsum=False, fold=True, pbf16=False, noclamp=False,
                 int8pv=False),
    "pbf16": dict(lsum=False, fold=False, pbf16=True, noclamp=False,
                  int8pv=False),
    "all": dict(lsum=True, fold=True, pbf16=True, noclamp=False,
                int8pv=False),
    "allnc": dict(lsum=True, fold=True, pbf16=True, noclamp=True,
                  int8pv=False),
    "int8pv": dict(lsum=False, fold=True, pbf16=True, noclamp=False,
                   int8pv=True),
    "sbf16": dict(lsum=False, fold=False, pbf16=True, noclamp=False,
                  int8pv=False, sbf16=True),
    "sbf16_lsum": dict(lsum=True, fold=False, pbf16=True, noclamp=False,
                       int8pv=False, sbf16=True),
    # decomposition probes for the speed-of-light account (not shippable)
    "projonly": dict(lsum=False, fold=False, pbf16=False, noclamp=False,
                     int8pv=False, projonly=True),
    "noexp": dict(lsum=False, fold=False, pbf16=False, noclamp=False,
                  int8pv=False, noexp=True),
    # int8 QK logits matmul (dynamic per-head scales), alone and with
    # the int8 PV matmul = fully-int8 attention
    "int8qk": dict(lsum=False, fold=True, pbf16=True, noclamp=False,
                   int8pv=False, int8qk=True),
    "int8attn": dict(lsum=False, fold=True, pbf16=True, noclamp=False,
                     int8pv=True, int8qk=True),
}

_ref_out = {}


def bench(name, rows=4):
    flags = FLAG_SETS[name]
    params = make_params(jax.random.PRNGKey(0), fold=flags["fold"])
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N_Q, D),
                          jnp.bfloat16) * 0.5

    def model(params, x, salt):
        x = x + salt.astype(x.dtype)
        for p in params:
            x = fused_block_v(x, p, rows=rows, **flags)
        return x

    # numerics first (single layer stack, batch 8 to keep it fast)
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
    variants = sys.argv[1:] or ["base", "lsum", "fold", "pbf16", "all",
                                "allnc", "int8pv"]
    for v in variants:
        try:
            bench(v)
        except Exception as e:
            print(f"{v:8s}: FAILED {type(e).__name__}: {e}", flush=True)
