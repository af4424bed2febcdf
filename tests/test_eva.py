"""EVA tower parity vs a torch replica of the timm eva_giant layout
(timm is not installed in this image; the replica follows the documented
BEiT-style attention with split q/v biases, which the converter also
handles in fused form)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embeds_tpu.core.config import VisionConfig
from clip_embeds_tpu.models.eva import (
    EVAVisionTower,
    convert_eva_trunk_state_dict,
    eva_giant_config,
)

pytestmark = pytest.mark.slow  # torch-oracle parity family (see pyproject)


def tiny_cfg() -> VisionConfig:
    return VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                        head_width=16, mlp_ratio=2.0, tower="eva")


@pytest.fixture(scope="module")
def torch_trunk():
    torch = pytest.importorskip("torch")

    class Attn(torch.nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.heads = heads
            self.qkv = torch.nn.Linear(dim, dim * 3, bias=False)
            self.q_bias = torch.nn.Parameter(torch.randn(dim) * 0.02)
            self.v_bias = torch.nn.Parameter(torch.randn(dim) * 0.02)
            self.proj = torch.nn.Linear(dim, dim)

        def forward(self, x):
            b, n, d = x.shape
            hd = d // self.heads
            bias = torch.cat(
                [self.q_bias, torch.zeros_like(self.q_bias), self.v_bias]
            )
            qkv = torch.nn.functional.linear(x, self.qkv.weight, bias)
            q, k, v = qkv.chunk(3, dim=-1)

            def split(t):
                return t.reshape(b, n, self.heads, hd).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, n, d)
            return self.proj(out)

    class Block(torch.nn.Module):
        def __init__(self, dim, heads, mlp):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
            self.attn = Attn(dim, heads)
            self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
            self.mlp = torch.nn.Sequential()
            self.mlp.fc1 = torch.nn.Linear(dim, mlp)
            self.mlp.fc2 = torch.nn.Linear(mlp, dim)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            h = self.mlp.fc1(self.norm2(x))
            h = torch.nn.functional.gelu(h)
            return x + self.mlp.fc2(h)

    class Trunk(torch.nn.Module):
        def __init__(self, dim=64, heads=4, depth=2, patch=16, img=32,
                     embed=48, mlp=128):
            super().__init__()

            class PE(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.proj = torch.nn.Conv2d(3, dim, patch, patch)

            self.patch_embed = PE()
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
            n = (img // patch) ** 2 + 1
            self.pos_embed = torch.nn.Parameter(torch.randn(1, n, dim) * 0.02)
            self.blocks = torch.nn.ModuleList(
                [Block(dim, heads, mlp) for _ in range(depth)]
            )
            self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
            self.head = torch.nn.Linear(dim, embed)

        def forward(self, x):
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat(
                [self.cls_token.expand(x.shape[0], -1, -1), x], dim=1
            )
            x = x + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            x = self.norm(x)
            return self.head(x[:, 0])

    torch.manual_seed(0)
    return Trunk().eval()


def test_eva_parity(torch_trunk):
    import torch

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_trunk(torch.tensor(images).permute(0, 3, 1, 2)).numpy()

    model = EVAVisionTower(tiny_cfg(), embed_dim=48, attn_impl="reference")
    params = convert_eva_trunk_state_dict(
        {"visual.trunk." + k: v for k, v in torch_trunk.state_dict().items()}
    )
    pooled, tokens = model.apply({"params": params}, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(pooled), ref, rtol=3e-4, atol=3e-4)
    assert tokens.shape == (2, 4, 64)


def test_eva_in_clip_factory():
    from clip_embeds_tpu.core.factory import create_model

    cfg = eva_giant_config()
    assert cfg.width == 1408 and cfg.layers == 40
    # tiny stand-in through the same CLIP wiring
    from clip_embeds_tpu.core.config import CLIPConfig, TextConfig
    from clip_embeds_tpu.models.clip import CLIP

    clip_cfg = CLIPConfig(
        embed_dim=48,
        vision=tiny_cfg(),
        text=TextConfig(context_length=12, vocab_size=64, width=32, heads=2,
                        layers=2),
    )
    model = CLIP(clip_cfg, attn_impl="reference")
    images = jnp.zeros((1, 32, 32, 3))
    text = jnp.zeros((1, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), images, text)["params"]
    out = model.apply({"params": params}, images, text)
    assert out["image_features"].shape == (1, 48)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5,
    )
