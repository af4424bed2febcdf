"""Custom-VJP fused training block: forward parity + exact gradients vs the
composable flax block (pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.models.layers import (
    FusedTrainBlock,
    ResidualAttentionBlock,
    Transformer,
)

B, N, D, H = 2, 11, 64, 4


def _assert_tree_close(got, want, rtol, atol):
    ga = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(got)}
    wa = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(want)}
    assert ga.keys() == wa.keys()
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(wa[k]),
                                   rtol=rtol, atol=atol, err_msg=k)


def _setup(quick=False, causal=False, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32)) * 0.5
    ref = ResidualAttentionBlock(D, H, quick_gelu=quick,
                                 attn_impl="reference")
    params = ref.init(jax.random.PRNGKey(seed), x, causal=causal)["params"]
    fused = FusedTrainBlock(D, H, quick_gelu=quick, interpret=True)
    return x, ref, fused, params


@pytest.mark.parametrize("quick,causal", [(False, False), (True, False),
                                          (False, True)])
def test_forward_parity_and_param_tree(quick, causal):
    x, ref, fused, params = _setup(quick, causal)
    want = ref.apply({"params": params}, x, causal=causal)
    # identical param trees: the fused module consumes the composable tree
    got = fused.apply({"params": params}, x, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quick,causal", [(False, False), (True, False),
                                          (False, True)])
def test_exact_gradients_vs_composable(quick, causal):
    """The custom VJP must produce the composable block's exact gradients
    (it linearizes block_reference at the true input)."""
    x, ref, fused, params = _setup(quick, causal)

    def loss_ref(p, x):
        y = ref.apply({"params": p}, x, causal=causal)
        return jnp.sum(jnp.sin(y))

    def loss_fused(p, x):
        y = fused.apply({"params": p}, x, causal=causal)
        return jnp.sum(jnp.sin(y))

    g_ref_p, g_ref_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_f_p, g_f_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    # the cotangent entering the block differs by the (tiny) fused-vs-
    # composable forward output delta inside sin'; tolerances reflect that
    np.testing.assert_allclose(np.asarray(g_f_x), np.asarray(g_ref_x),
                               rtol=2e-4, atol=2e-5)
    _assert_tree_close(g_f_p, g_ref_p, rtol=2e-4, atol=2e-5)


def test_exact_gradients_same_cotangent():
    """With an IDENTICAL cotangent fed to both backward passes, gradients
    agree to fp32 vjp tolerance (the VJP formula is the composable one; the
    residual rounding gap is flax LayerNorm's fast-variance form
    mean(x^2)-mean(x)^2 vs the two-pass form in block_reference)."""
    x, ref, fused, params = _setup()

    y_ref, vjp_ref = jax.vjp(
        lambda p, x: ref.apply({"params": p}, x), params, x)
    y_f, vjp_f = jax.vjp(
        lambda p, x: fused.apply({"params": p}, x), params, x)
    g = jnp.asarray(
        np.random.default_rng(3).standard_normal(y_ref.shape),
        jnp.float32,
    )
    gp_ref, gx_ref = vjp_ref(g)
    gp_f, gx_f = vjp_f(g)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    _assert_tree_close(gp_f, gp_ref, rtol=1e-4, atol=1e-5)


def test_transformer_fused_train_param_tree_matches():
    x = jnp.zeros((1, 8, D))
    comp = Transformer(D, 2, H)
    fused = Transformer(D, 2, H, block_impl="fused-train")
    p_comp = comp.init(jax.random.PRNGKey(0), x)["params"]
    # interpret-mode init on CPU: FusedTrainBlock needs interpret, so build
    # the tree via the block module directly per layer instead
    p_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_leaves_with_path(p_comp)
    }
    blk = FusedTrainBlock(D, H, interpret=True)
    p_blk = blk.init(jax.random.PRNGKey(0), x)["params"]
    blk_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_leaves_with_path(p_blk)
    }
    comp_blk_paths = {
        jax.tree_util.keystr(k[1:])
        for k, _ in jax.tree_util.tree_leaves_with_path(p_comp)
        if jax.tree_util.keystr(k).startswith("['resblocks_0']")
    }
    assert blk_paths == comp_blk_paths
    # shapes agree too
    shapes_c = {
        jax.tree_util.keystr(k[1:]): v.shape
        for k, v in jax.tree_util.tree_leaves_with_path(p_comp)
        if jax.tree_util.keystr(k).startswith("['resblocks_0']")
    }
    shapes_f = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_leaves_with_path(p_blk)
    }
    assert shapes_c == shapes_f
    assert fused  # constructed fine


# -- round 4: residual backward (fused-kernel recompute) ----------------------


def _setup_res(quick=False, causal=False, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32)) * 0.5
    ref = ResidualAttentionBlock(D, H, quick_gelu=quick,
                                 attn_impl="reference")
    params = ref.init(jax.random.PRNGKey(seed), x, causal=causal)["params"]
    res = FusedTrainBlock(D, H, quick_gelu=quick, interpret=True,
                          bwd_impl="residual")
    vjp = FusedTrainBlock(D, H, quick_gelu=quick, interpret=True)
    return x, ref, res, vjp, params


@pytest.mark.parametrize("quick,causal", [(False, False), (True, False),
                                          (False, True)])
def test_residual_backward_matches_vjp_backward(quick, causal):
    """bwd_impl='residual' (fused-kernel recompute + manual matmul grads +
    jax.vjp'd elementwise pieces) must produce the same gradients as the
    round-3 jax.vjp(block_reference) backward — same formulas, the
    intermediates now come from the kernel."""
    x, ref, res, vjp, params = _setup_res(quick, causal)

    def loss(mod):
        def f(p, x):
            y = mod.apply({"params": p}, x, causal=causal)
            return jnp.sum(jnp.sin(y))
        return f

    g_v_p, g_v_x = jax.grad(loss(vjp), argnums=(0, 1))(params, x)
    g_r_p, g_r_x = jax.grad(loss(res), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_r_x), np.asarray(g_v_x),
                               rtol=2e-4, atol=2e-5)
    _assert_tree_close(g_r_p, g_v_p, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("quick,causal", [(False, False), (False, True)])
def test_residual_backward_matches_composable(quick, causal):
    x, ref, res, _, params = _setup_res(quick, causal)

    def loss_ref(p, x):
        y = ref.apply({"params": p}, x, causal=causal)
        return jnp.sum(jnp.sin(y))

    def loss_res(p, x):
        y = res.apply({"params": p}, x, causal=causal)
        return jnp.sum(jnp.sin(y))

    g_ref_p, g_ref_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_r_p, g_r_x = jax.grad(loss_res, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_r_x), np.asarray(g_ref_x),
                               rtol=2e-4, atol=2e-5)
    _assert_tree_close(g_r_p, g_ref_p, rtol=2e-4, atol=2e-5)


def test_residual_kernel_intermediates_shapes():
    from clip_embeds_tpu.ops.fused_block import fused_block_residuals

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, 16, D)).astype(np.float32))
    p = ResidualAttentionBlock(D, H, attn_impl="reference").init(
        jax.random.PRNGKey(0), x)["params"]
    y, qkv, att, m1, x_mid = fused_block_residuals(
        x,
        p["attn"]["in_proj"]["kernel"], p["attn"]["in_proj"]["bias"],
        p["attn"]["out_proj"]["kernel"], p["attn"]["out_proj"]["bias"],
        p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"]["bias"],
        p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"]["bias"],
        jnp.stack([p["ln_1"]["scale"], p["ln_1"]["bias"]]),
        jnp.stack([p["ln_2"]["scale"], p["ln_2"]["bias"]]),
        heads=H, kv_valid=16, interpret=True,
    )
    assert y.shape == (B, 16, D)
    assert qkv.shape == (B, 16, 3 * D)
    assert att.shape == (B, 16, D)
    assert m1.shape == (B, 16, 4 * D)
    assert x_mid.shape == (B, 16, D)
    # y must equal the plain fused_block output
    from clip_embeds_tpu.ops.fused_block import fused_block

    y2 = fused_block(
        x,
        p["attn"]["in_proj"]["kernel"], p["attn"]["in_proj"]["bias"],
        p["attn"]["out_proj"]["kernel"], p["attn"]["out_proj"]["bias"],
        p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"]["bias"],
        p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"]["bias"],
        jnp.stack([p["ln_1"]["scale"], p["ln_1"]["bias"]]),
        jnp.stack([p["ln_2"]["scale"], p["ln_2"]["bias"]]),
        heads=H, kv_valid=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6,
                               atol=1e-6)
