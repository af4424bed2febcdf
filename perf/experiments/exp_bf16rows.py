"""bf16 fused block at 2 vs 4 sequences per program (production kernel)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

import clip_embeds_tpu.ops.fused_block as fb

B, N, D, H, L = 256, 592, 1024, 16, 24
MLP = 4 * D


def make_params(key, l=L):
    ks = jax.random.split(key, l * 4)
    sc = 0.02
    out = []
    for i in range(l):
        out.append(dict(
            wqkv=jax.random.normal(ks[4 * i], (D, 3 * D), jnp.float32) * sc,
            bqkv=jnp.zeros((3 * D,)),
            wo=jax.random.normal(ks[4 * i + 1], (D, D), jnp.float32) * sc,
            bo=jnp.zeros((D,)),
            w1=jax.random.normal(ks[4 * i + 2], (D, MLP), jnp.float32) * sc,
            b1=jnp.zeros((MLP,)),
            w2=jax.random.normal(ks[4 * i + 3], (MLP, D), jnp.float32) * sc,
            b2=jnp.zeros((D,)),
            ln1=jnp.stack([jnp.ones((D,)), jnp.zeros((D,))]),
            ln2=jnp.stack([jnp.ones((D,)), jnp.zeros((D,))]),
        ))
    return out


def bench(rows):
    fb._pick_rows = lambda b: rows
    params = jax.device_put(make_params(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)

    def model(params, x, salt):
        x = x + salt.astype(x.dtype)
        for p in params:
            x = fb.fused_block(
                x, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["w1"], p["b1"],
                p["w2"], p["b2"], p["ln1"], p["ln2"],
                heads=H, kv_valid=577,
                quick_gelu=True,
            )
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
    print(f"bf16 rows={rows}: {per * 1000 / L:6.2f} ms/layer -> "
          f"blocks-only {B / per:,.0f} img/s", flush=True)


if __name__ == "__main__":
    for rows in (int(a) for a in (sys.argv[1:] or ["2", "4"])):
        try:
            bench(rows)
        except Exception as e:
            print(f"rows={rows}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
