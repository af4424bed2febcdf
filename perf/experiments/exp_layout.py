"""Experiment: fold attention head reshapes/transposes into einsum wiring.

Times 24 ViT-L blocks (width 1024, heads 16, seq 640, batch 256, bf16) with
three attention wirings, using the long-minus-short fori_loop method.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, H = 256, 640, 1024, 16
HD = D // H
L = 24


def make_params(key):
    ks = jax.random.split(key, L * 6)
    p = []
    s = 0.02
    for i in range(L):
        p.append({
            "wqkv": jax.random.normal(ks[6*i], (D, 3*D), jnp.bfloat16) * s,
            "bqkv": jnp.zeros((3*D,), jnp.bfloat16),
            "wo": jax.random.normal(ks[6*i+1], (D, D), jnp.bfloat16) * s,
            "bo": jnp.zeros((D,), jnp.bfloat16),
            "w1": jax.random.normal(ks[6*i+2], (D, 4*D), jnp.bfloat16) * s,
            "b1": jnp.zeros((4*D,), jnp.bfloat16),
            "w2": jax.random.normal(ks[6*i+3], (4*D, D), jnp.bfloat16) * s,
            "b2": jnp.zeros((D,), jnp.bfloat16),
            "g1": jnp.ones((D,), jnp.bfloat16),
            "g2": jnp.ones((D,), jnp.bfloat16),
        })
    return p


def ln(x, g):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * g


def attn_transpose(h, p):
    qkv = h @ p["wqkv"] + p["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def sh(t):
        return t.reshape(B, N, H, HD).transpose(0, 2, 1, 3)
    q, k, v = sh(q), sh(k), sh(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * HD**-0.5
    pr = jax.nn.softmax(logits, -1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    return o @ p["wo"] + p["bo"]


def attn_bnhd(h, p):
    qkv = (h @ p["wqkv"] + p["bqkv"]).reshape(B, N, 3, H, HD)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * HD**-0.5
    pr = jax.nn.softmax(logits, -1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr, v)
    return o.reshape(B, N, D) @ p["wo"] + p["bo"]


def attn_einsum_w(h, p):
    # weights pre-shaped so head split/merge live inside the einsums
    wqkv = p["wqkv"].reshape(D, 3, H, HD)
    bqkv = p["bqkv"].reshape(3, H, HD)
    qkv = jnp.einsum("bnd,dthh2->bnthh2", h,
                     wqkv.reshape(D, 3, H, HD)) + bqkv
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * HD**-0.5
    pr = jax.nn.softmax(logits, -1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr, v)
    wo = p["wo"].reshape(H, HD, D)
    return jnp.einsum("bqhd,hdo->bqo", o, wo) + p["bo"]


def block(h, p, attn):
    h = h + attn(ln(h, p["g1"]), p)
    m = ln(h, p["g2"])
    m = m @ p["w1"] + p["b1"]
    m = m * jax.nn.sigmoid(1.702 * m)
    return h + (m @ p["w2"] + p["b2"])


def model(params, x, attn):
    for p in params:
        x = block(x, p, attn)
    return x


def bench(attn_name, attn, params, x):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(params, x, iters):
        def body(_, salt):
            out = model(params, x + salt.astype(x.dtype), attn)
            return out[0, 0, 0].astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(1e-6))

    iters = 12
    float(loop(params, x, 1)); float(loop(params, x, iters))
    t0 = time.perf_counter(); float(loop(params, x, 1))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(params, x, iters))
    tl = time.perf_counter() - t0
    per = (tl - ts) / (iters - 1)
    print(f"{attn_name}: {per*1000:.1f} ms/iter -> {B/per:.0f} img-equiv/s")


def main():
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    for name, fn in [("transpose", attn_transpose),
                     ("bnhd", attn_bnhd),
                     ("einsum_w", attn_einsum_w)]:
        bench(name, fn, params, x)


if __name__ == "__main__":
    main()
