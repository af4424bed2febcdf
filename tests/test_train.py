"""End-to-end training smoke tests (the reference test_training_simple.py
analogue) + GradCache exactness + sharded-step equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.core.config import get_model_config
from clip_embeds_tpu.core.factory import create_model
from clip_embeds_tpu.data.synthetic import synthetic_batches
from clip_embeds_tpu.parallel.mesh import batch_sharding, create_mesh
from clip_embeds_tpu.train.optim import adamw, decay_mask
from clip_embeds_tpu.train.schedules import cosine_lr
from clip_embeds_tpu.train.steps import TrainState, make_clip_train_step


@pytest.fixture(scope="module")
def tiny_model():
    model, params = create_model("test-tiny", attn_impl="reference")
    return model, params


def _batches(n, bs=8, hard=0):
    cfg = get_model_config("test-tiny")
    return list(
        synthetic_batches(
            bs, cfg.vision.image_size, cfg.text.context_length,
            num_batches=n, hard_negatives=hard,
        )
    )


@pytest.mark.slow
def test_train_loss_decreases(tiny_model):
    model, params = tiny_model
    tx = adamw(cosine_lr(1e-3, warmup=2, total_steps=20), weight_decay=0.01)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model))

    # repeat the same batch: loss must drop if training works end to end
    batch = _batches(1)[0]
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert float(state.params["logit_scale"]) <= 4.6052 + 1e-6
    assert int(state.step) == 8


@pytest.mark.slow
def test_hard_text_step_runs(tiny_model):
    model, params = tiny_model
    tx = adamw(1e-4)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, use_hard_text=True))
    batch = _batches(1, hard=4)[0]
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_grad_cache_matches_plain(tiny_model):
    """GradCache chunked gradients == full-batch gradients (exactness)."""
    model, params = tiny_model
    tx = adamw(0.0, weight_decay=0.0)  # lr 0: compare grads via loss only
    batch = _batches(1, bs=8)[0]

    from clip_embeds_tpu.losses.clip_loss import clip_loss
    from clip_embeds_tpu.train.grad_cache import cache_grad_step

    def encode(p, chunk):
        out = model.apply({"params": p}, chunk["images"], chunk["texts"])
        return {"img": out["image_features"], "txt": out["text_features"]}

    scale = jnp.exp(params["logit_scale"])

    def rep_loss(reps):
        return clip_loss(reps["img"], reps["txt"], scale)

    def full_loss(p):
        return rep_loss(encode(p, batch))

    loss_full, grads_full = jax.value_and_grad(full_loss)(params)
    loss_gc, grads_gc = cache_grad_step(encode, rep_loss, params, batch, 4)

    np.testing.assert_allclose(float(loss_gc), float(loss_full), rtol=1e-6)
    flat_full = jax.tree.leaves(grads_full)
    flat_gc = jax.tree.leaves(grads_gc)
    for a, b in zip(flat_full, flat_gc):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


@pytest.mark.slow
def test_sharded_step_matches_single_device(tiny_model):
    """The same jitted step over an 8-device data mesh gives the same loss."""
    model, params = tiny_model
    tx = adamw(1e-3)
    batch = _batches(1, bs=16)[0]

    step = jax.jit(make_clip_train_step(model))
    state1 = TrainState.create(params, tx)
    _, m_single = step(state1, batch)

    mesh = create_mesh(8, 1)
    sharding = batch_sharding(mesh)
    batch_sharded = jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )
    state2 = TrainState.create(params, tx)
    with jax.sharding.set_mesh(mesh):
        state2, m_sharded = step(state2, batch_sharded)

    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-5
    )


def test_decay_mask_excludes_norms_and_scalars(tiny_model):
    _, params = tiny_model
    mask = decay_mask(params)
    assert mask["logit_scale"] is False
    v = mask["visual"]
    assert v["class_embedding"] is False  # ndim < 2
    # reference exclude lambda (main.py:335) decays 2-D pos embeds
    assert v["positional_embedding"] is True
    assert v["ln_pre"]["scale"] is False
    assert v["patch_embed"]["kernel"] is True
    blk = v["transformer"]["resblocks_0"]
    assert blk["attn"]["in_proj"]["kernel"] is True
    assert blk["attn"]["in_proj"]["bias"] is False


@pytest.mark.slow
def test_remat_train_step_runs():
    """Regression: remat + flash custom_vjp static args (nn.remat counts self
    as argnum 0; a wrong index leaks a tracer into nondiff_argnums)."""
    from clip_embeds_tpu.models.clip import CLIP

    model0, params = create_model("test-tiny", attn_impl="reference")
    model = CLIP(model0.cfg, attn_impl="reference", remat=True)
    tx = adamw(1e-4)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model))
    batch = _batches(1)[0]
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_zero1_sharded_opt_state_matches(tiny_model):
    """Optimizer-state sharding over the mesh preserves the update exactly."""
    from clip_embeds_tpu.parallel.sharding_rules import zero1_opt_state_sharding

    model, params = tiny_model
    tx = adamw(1e-3)
    batch = _batches(1, bs=16)[0]
    step = jax.jit(make_clip_train_step(model))

    s_ref = TrainState.create(params, tx)
    s_ref, _ = step(s_ref, batch)

    mesh = create_mesh(8, 1)
    s_sh = TrainState.create(params, tx)
    s_sh = s_sh.replace(
        opt_state=zero1_opt_state_sharding(mesh, s_sh.opt_state)
    )
    sharding = batch_sharding(mesh)
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    with jax.sharding.set_mesh(mesh):
        s_sh, _ = step(s_sh, batch_sh)

    # absolute tolerance relative to the update scale (lr=1e-3): Adam's
    # rsqrt(nu) amplifies reduction-order noise where nu ~ 0, so relative
    # comparison is meaningless there
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_sh.params)):
        assert np.abs(np.asarray(b) - np.asarray(a)).max() < 1e-4


def test_vlm2vec_argument_dataclasses():
    from clip_embeds_tpu.train.arguments import (
        DataArguments,
        ModelArguments,
        MTEBArguments,
        TrainingArguments,
        parse_dataclasses,
    )

    margs, dargs, targs, mteb = parse_dataclasses(
        [ModelArguments, DataArguments, TrainingArguments, MTEBArguments],
        [
            "--model_name", "llava-v1.5-7b",
            "--lora", "--lora_r", "8",
            "--subset_name", "ImageNet_1K", "OK-VQA",
            "--temperature", "0.02",
            "--grad_cache", "--gc_q_chunk_size", "1",
            "--no_bf16",
            "--max_len", "1024",
        ],
    )
    assert margs.model_name == "llava-v1.5-7b"
    assert margs.lora and margs.lora_r == 8
    assert margs.lora_targets[:2] == ("qkv_proj", "o_proj")
    assert dargs.subset_name == ["ImageNet_1K", "OK-VQA"]
    assert dargs.max_len == 1024
    assert targs.grad_cache and targs.gc_q_chunk_size == 1
    assert targs.bf16 is False
    assert targs.gc_p_chunk_size == 2  # default preserved
    assert mteb.tasks is None


def test_model_bundle_roundtrip(tmp_path):
    """save_model_bundle / load_model_bundle (push_to_hf_hub layout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_embeds_tpu.core.export import (
        load_model_bundle,
        save_model_bundle,
    )
    from clip_embeds_tpu.core.factory import create_model

    model, params = create_model("test-tiny", seed=7)
    folder = save_model_bundle(
        str(tmp_path / "bundle"), model, params,
        model_name="ViT-L-14-336", pretrained_tag="openai",
    )
    import json
    import os

    cfg = json.load(open(os.path.join(folder, "open_clip_config.json")))
    assert cfg["preprocess_cfg"]["mean"] == [0.48145466, 0.4578275,
                                             0.40821073]
    m2, p2 = load_model_bundle(folder)
    assert m2.cfg == model.cfg
    imgs = jnp.zeros((1, 32, 32, 3))
    txts = jnp.zeros((1, 16), jnp.int32)
    a = model.apply({"params": params}, imgs, txts)
    b = m2.apply({"params": p2}, imgs, txts)
    np.testing.assert_allclose(
        np.asarray(a["image_features"]), np.asarray(b["image_features"]),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_distill_train_step(tiny_model):
    """--distill path: student improves while the teacher stays frozen
    (reference main.py:208-248, train.py:70-107, loss.py:241-277)."""
    from clip_embeds_tpu.train.steps import make_distill_train_step

    model, params = tiny_model
    _, teacher_params = create_model("test-tiny", attn_impl="reference",
                                     seed=3)
    tx = adamw(1e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(make_distill_train_step(model, model))

    teacher_before = jax.device_get(teacher_params)
    batch = _batches(1)[0]
    losses = []
    for _ in range(6):
        state, metrics = step(state, teacher_params, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert float(metrics["contrastive_loss"]) > 0
    assert float(metrics["distill_loss"]) > 0
    # teacher untouched
    after = jax.device_get(teacher_params)
    for a, b in zip(jax.tree.leaves(teacher_before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_distill_cli_synthetic(tmp_path):
    """End-to-end --distill train on the synthetic dataset (CLI flags
    --distill-model/--distill-pretrained, reference params.py:461-469)."""
    from clip_embeds_tpu.cli.train import main

    state = main([
        "--model", "test-tiny", "--dataset-type", "synthetic",
        "--train-num-samples", "16", "--batch-size", "8", "--epochs", "1",
        "--distill-model", "test-tiny", "--distill-pretrained", "openai",
        "--precision", "fp32", "--log-every", "1",
    ])
    assert int(state.step) == 2


def test_fsdp_sharded_step_matches_single_device(tiny_model):
    """FSDP param sharding (fsdp_param_specs over the data axis) preserves
    the training trajectory exactly: XLA all-gathers params per use and
    reduce-scatters grads; the math is unchanged."""
    from clip_embeds_tpu.parallel.sharding_rules import (
        fsdp_param_specs,
        fsdp_shard_params,
    )

    model, params = tiny_model
    batch = _batches(1, bs=16)[0]
    step = jax.jit(make_clip_train_step(model))
    s_ref = TrainState.create(params, adamw(1e-3))
    s_ref, m_ref = step(s_ref, batch)
    s_ref, m_ref2 = step(s_ref, batch)

    mesh = create_mesh(8, 1)
    specs = fsdp_param_specs(params, mesh, min_size=64)
    # the tiny model must actually shard something for the test to mean much
    import jax.tree_util as jtu
    assert any(
        any(ax is not None for ax in spec)
        for spec in jtu.tree_leaves(specs, is_leaf=lambda x: isinstance(
            x, jax.sharding.PartitionSpec))
    )
    sharded = fsdp_shard_params(mesh, params, min_size=64)
    s_sh = TrainState.create(sharded, adamw(1e-3))
    sharding = batch_sharding(mesh)
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    with jax.sharding.set_mesh(mesh):
        s_sh, m_sh = step(s_sh, batch_sh)
        s_sh, m_sh2 = step(s_sh, batch_sh)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_sh2["loss"]), float(m_ref2["loss"]), rtol=1e-5)
    # params remain FSDP-sharded after the update (no silent regather)
    leaf = s_sh.params["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert not leaf.sharding.is_fully_replicated
