"""Pallas fused attention vs XLA reference (interpreter mode on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.ops import flash_attention as fa
from clip_embeds_tpu.ops.attention import reference_attention


def _pallas_interpret(monkeypatch):
    """Route pallas_call through the interpreter (no TPU in tests)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        kw.pop("cost_estimate", None)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 4, 128, 64),   # aligned
        (1, 2, 77, 64),    # text length, needs padding
        (1, 3, 577, 64),   # ViT-L/14-336 length, needs padding
    ],
)
def test_matches_reference(monkeypatch, causal, shape):
    _pallas_interpret(monkeypatch)
    r = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(r.standard_normal(shape).astype(np.float32)) for _ in range(3)
    )
    out = fa.flash_attention(q, k, v, causal)
    expected = reference_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_gradients_match(monkeypatch):
    _pallas_interpret(monkeypatch)
    r = np.random.default_rng(1)
    shape = (1, 2, 77, 32)
    q, k, v = (
        jnp.asarray(r.standard_normal(shape).astype(np.float32)) for _ in range(3)
    )

    def loss_flash(q, k, v):
        return fa.flash_attention(q, k, v, True).sum()

    def loss_ref(q, k, v):
        return reference_attention(q, k, v, causal=True).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_bf16_io(monkeypatch):
    _pallas_interpret(monkeypatch)
    r = np.random.default_rng(2)
    shape = (1, 2, 128, 64)
    q, k, v = (
        jnp.asarray(r.standard_normal(shape).astype(np.float32), jnp.bfloat16)
        for _ in range(3)
    )
    out = fa.flash_attention(q, k, v, False)
    assert out.dtype == jnp.bfloat16
    expected = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 128, 32),   # aligned, single tile
        (1, 2, 77, 32),    # padded rows exercise the masked-row guard
        (1, 1, 256, 32),   # multi-tile accumulation of dK/dV
    ],
)
def test_fused_backward_matches_reference(monkeypatch, causal, shape):
    _pallas_interpret(monkeypatch)
    r = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(r.standard_normal(shape).astype(np.float32))
        for _ in range(3)
    )
    g = jnp.asarray(r.standard_normal(shape).astype(np.float32))

    # force multi-tile on the 256 case
    block_q = 128 if shape[2] == 256 else 0
    out, vjp = jax.vjp(
        lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, causal, block_q),
        q, k, v,
    )
    dq, dk, dv = vjp(g)

    ref_out, ref_vjp = jax.vjp(
        lambda q_, k_, v_: reference_attention(q_, k_, v_, causal=causal),
        q, k, v,
    )
    rdq, rdk, rdv = ref_vjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv),
                               rtol=2e-4, atol=2e-4)
