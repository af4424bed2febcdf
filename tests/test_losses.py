"""Loss parity vs reference torch implementations + multi-device equivalence."""

import importlib
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.losses.clip_loss import (
    clip_loss,
    clip_loss_hard_text,
    embedding_contrastive_loss,
    pacl_clip_loss,
    softmax_cross_entropy,
)
from clip_embeds_tpu.losses.siglip import siglip_loss, siglip_loss_ring
from clip_embeds_tpu.losses.sparc import (
    masked_pairwise_contrastive_loss,
    sparc_group_patches,
    sparc_loss,
)
from clip_embeds_tpu.parallel.mesh import create_mesh


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def feats(rng=None):
    r = np.random.default_rng(1)
    img = _norm(r.standard_normal((16, 32)).astype(np.float32))
    txt = _norm(r.standard_normal((16, 32)).astype(np.float32))
    return img, txt


@pytest.fixture(scope="module")
def ref_pacl_losses():
    """Reference PACL ClipLoss/SparcLoss, loaded from /root/reference."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import importlib.util

    path = "/root/reference/Patch-Aligned-Contrastive-Learning/model/pacl.py"
    # pacl.py imports open_clip + transformers at module scope; execute only
    # the loss classes by loading source and trimming is fragile — instead
    # stub the heavy imports.
    import importlib.machinery

    for name in ("ftfy",):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.fix_text = lambda t: t
            stub.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = stub
    oc_stub = types.ModuleType("open_clip.src.open_clip")
    oc_stub.__spec__ = importlib.machinery.ModuleSpec(
        "open_clip.src.open_clip", None
    )
    parent = types.ModuleType("open_clip")
    parent.__spec__ = importlib.machinery.ModuleSpec("open_clip", None)
    src = types.ModuleType("open_clip.src")
    src.__spec__ = importlib.machinery.ModuleSpec("open_clip.src", None)
    sys.modules.setdefault("open_clip", parent)
    sys.modules.setdefault("open_clip.src", src)
    sys.modules.setdefault("open_clip.src.open_clip", oc_stub)

    spec = importlib.util.spec_from_file_location("_ref_pacl", path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference pacl unavailable: {exc}")
    return mod


def test_clip_loss_matches_reference(feats, ref_pacl_losses):
    import torch

    img, txt = feats
    ref = ref_pacl_losses.ClipLoss(temperature=0.1)
    expected = ref(torch.from_numpy(img), torch.from_numpy(txt)).item()
    got = float(pacl_clip_loss(jnp.asarray(img), jnp.asarray(txt), 0.1))
    assert abs(got - expected) < 1e-5


@pytest.mark.slow
def test_sparc_loss_matches_reference(ref_pacl_losses):
    import torch

    r = np.random.default_rng(2)
    b, p, t, d = 4, 9, 7, 16
    v_patch = r.standard_normal((b, p, d)).astype(np.float32)
    l_token = r.standard_normal((b, t, d)).astype(np.float32)
    mask = (r.random((b, t)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0

    grouped = sparc_group_patches(
        jnp.asarray(v_patch), jnp.asarray(l_token), sigma=1.0 / p
    )
    grouped_n = np.asarray(grouped) / np.linalg.norm(
        np.asarray(grouped), axis=-1, keepdims=True
    )
    l_token_n = _norm(l_token)

    ref = ref_pacl_losses.SparcLoss(temperature=1.0)
    expected = ref(
        torch.from_numpy(v_patch),
        torch.from_numpy(l_token_n),
        torch.from_numpy(grouped_n),
        torch.from_numpy(mask),
    ).item()

    got = float(
        sparc_loss(
            jnp.asarray(v_patch),
            jnp.asarray(l_token_n),
            jnp.asarray(grouped_n),
            jnp.asarray(mask),
            temperature=1.0,
        )
    )
    assert abs(got - expected) < 1e-4

    # grouping math itself vs the reference forward
    sim = torch.einsum(
        "btd,bpd->btp", torch.from_numpy(l_token), torch.from_numpy(v_patch)
    )
    smin = sim.min(dim=-1, keepdim=True)[0]
    smax = sim.max(dim=-1, keepdim=True)[0]
    sim = (sim - smin) / (smax - smin + 1e-8)
    sim = torch.where(sim < 1.0 / p, torch.zeros(()), sim)
    w = sim / (sim.sum(dim=-1, keepdim=True) + 1e-8)
    ref_grouped = torch.einsum("btp,bpd->btd", w, torch.from_numpy(v_patch))
    np.testing.assert_allclose(
        np.asarray(grouped), ref_grouped.numpy(), rtol=1e-4, atol=1e-5
    )


def test_hard_text_loss():
    r = np.random.default_rng(3)
    img = jnp.asarray(_norm(r.standard_normal((8, 16)).astype(np.float32)))
    txt = jnp.asarray(_norm(r.standard_normal((8, 16)).astype(np.float32)))
    hard = jnp.asarray(_norm(r.standard_normal((4, 16)).astype(np.float32)))
    scale = jnp.asarray(10.0)

    loss = clip_loss_hard_text(img, txt, hard, scale)
    assert np.isfinite(float(loss))

    # with all hard rows masked out it reduces to plain clip loss
    invalid = jnp.zeros((4,), bool)
    masked = clip_loss_hard_text(img, txt, hard, scale, hard_valid=invalid)
    plain = clip_loss(img, txt, scale)
    np.testing.assert_allclose(float(masked), float(plain), rtol=1e-6)

    # hard negatives must increase (or keep) the image-side loss
    assert float(loss) >= float(plain) - 1e-6


@pytest.mark.slow
def test_siglip_ring_matches_global(feats):
    img, txt = feats
    mesh = create_mesh(8, 1)
    scale = jnp.asarray(10.0)
    bias = jnp.asarray(-10.0)

    global_loss = siglip_loss(jnp.asarray(img), jnp.asarray(txt), scale, bias)
    ring_loss = siglip_loss_ring(
        jnp.asarray(img), jnp.asarray(txt), scale, bias, mesh
    )
    np.testing.assert_allclose(float(ring_loss), float(global_loss), rtol=1e-5)


@pytest.mark.slow
def test_siglip_ring_gradients_match(feats):
    img, txt = feats
    mesh = create_mesh(8, 1)
    scale = jnp.asarray(10.0)
    bias = jnp.asarray(-10.0)

    g_global = jax.grad(
        lambda i, t: siglip_loss(i, t, scale, bias)
    )(jnp.asarray(img), jnp.asarray(txt))
    g_ring = jax.grad(
        lambda i, t: siglip_loss_ring(i, t, scale, bias, mesh)
    )(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_global), rtol=1e-4, atol=1e-6
    )


def test_embedding_contrastive_loss(feats):
    img, txt = feats
    loss = embedding_contrastive_loss(jnp.asarray(img), jnp.asarray(txt))
    import torch

    logits = torch.from_numpy(img) @ torch.from_numpy(txt).T / 0.02
    expected = torch.nn.functional.cross_entropy(
        logits, torch.arange(16)
    ).item()
    assert abs(float(loss) - expected) < 1e-4


def test_clip_loss_sharded_matches_single_device(feats):
    """clip_loss under pjit over the mesh == single-device value."""
    img, txt = feats
    mesh = create_mesh(8, 1)
    scale = jnp.asarray(10.0)
    single = clip_loss(jnp.asarray(img), jnp.asarray(txt), scale)

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded_in = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(jnp.asarray(img), sharded_in)
    txt_s = jax.device_put(jnp.asarray(txt), sharded_in)
    loss_fn = jax.jit(clip_loss)
    with jax.sharding.set_mesh(mesh):
        sharded = loss_fn(img_s, txt_s, scale)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-5)


def test_distill_clip_loss_matches_reference(feats):
    """distill_clip_loss vs the reference DistillClipLoss
    (open_clip/src/open_clip/loss.py:241-277) as a runtime torch oracle."""
    torch = pytest.importorskip("torch")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_oc_loss", "/root/reference/open_clip/src/open_clip/loss.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    img, txt = feats
    r = np.random.default_rng(7)
    t_img = _norm(r.standard_normal(img.shape).astype(np.float32))
    t_txt = _norm(r.standard_normal(txt.shape).astype(np.float32))

    # NOTE: the fork's DistillClipLoss.forward is latently broken — the
    # usehardtext refactor made get_ground_truth return (labels, labels)
    # (loss.py:124) while the unmodified DistillClipLoss still passes the
    # result straight to F.cross_entropy (loss.py:265-268), so calling it
    # raises TypeError. Oracle the two components it *defines* instead:
    # dist_loss (loss.py:243-244) and the upstream contrastive CE.
    loss_mod = ref.DistillClipLoss()
    import torch.nn.functional as F

    with torch.no_grad():
        s_img = 10.0 * torch.from_numpy(img) @ torch.from_numpy(txt).T
        t_im = 50.0 * torch.from_numpy(t_img) @ torch.from_numpy(t_txt).T
        labels = torch.arange(img.shape[0])
        expected = {
            "contrastive_loss": (
                F.cross_entropy(s_img, labels)
                + F.cross_entropy(s_img.T, labels)
            ) / 2,
            "distill_loss": (
                loss_mod.dist_loss(t_im, s_img)
                + loss_mod.dist_loss(t_im.T, s_img.T)
            ) / 2,
        }
    from clip_embeds_tpu.losses.clip_loss import distill_clip_loss

    contrastive, distill = distill_clip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(10.0),
        jnp.asarray(t_img), jnp.asarray(t_txt), jnp.asarray(50.0),
    )
    np.testing.assert_allclose(
        float(contrastive), expected["contrastive_loss"].item(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(distill), expected["distill_loss"].item(), rtol=1e-5
    )
