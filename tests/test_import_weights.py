"""Weight import — 4-channel patch-embed surgery + torch ViT state-dict
mapping validated against a real torch forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from fedvit_tpu.models.import_weights import (expand_patch_embed_in_channels,
                                              import_torch_vit)
from fedvit_tpu.models.vit import VisionTransformer


def test_expand_patch_embed_mean_rule():
    m3 = VisionTransformer(image_size=32, patch_size=16, in_channels=3,
                           embed_dim=64, depth=1, num_heads=2,
                           drop_path_rate=0.0)
    v3 = m3.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)))
    p4 = expand_patch_embed_in_channels(v3["params"], 3, 4)
    w3 = np.asarray(v3["params"]["patch_embed"]["proj"]["kernel"])
    w4 = np.asarray(p4["patch_embed"]["proj"]["kernel"])
    assert w4.shape == (16 * 16 * 4, 64)
    w3p = w3.reshape(256, 3, 64)
    w4p = w4.reshape(256, 4, 64)
    assert np.allclose(w4p[:, :3], w3p)
    assert np.allclose(w4p[:, 3], w3p.mean(axis=1))  # 4th ch = RGB mean
    # on equal-channel input, 4-ch model with expanded weights must match
    # the 3-ch model exactly at the patch-embed output (linear layer)
    m4 = VisionTransformer(image_size=32, patch_size=16, in_channels=4,
                           embed_dim=64, depth=1, num_heads=2,
                           drop_path_rate=0.0)
    rng = np.random.default_rng(0)
    x3 = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    gray = x3.mean(-1, keepdims=True)
    x4 = np.concatenate([x3, gray], axis=-1)
    # patch-embed equivalence needs <x4, w4> = <x3, w3> + <gray, mean(w3)>
    # which equals <x3,w3> only if gray term matches added mass — instead we
    # check the documented property: zero 4th channel reproduces 3-ch output
    x4z = np.concatenate([x3, np.zeros_like(gray)], axis=-1)
    v4 = {"params": {**v3["params"], "patch_embed":
                     {"proj": {"kernel": jnp.asarray(w4),
                               "bias": v3["params"]["patch_embed"]["proj"]["bias"]}}}}
    o3 = m3.apply(v3, jnp.asarray(x3))
    o4 = m4.apply(v4, jnp.asarray(x4z))
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4), atol=1e-5)


class _TorchBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        # timm ViT uses LayerNorm eps=1e-6 (flax default) — match it
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.ModuleDict()
        self.attn["qkv"] = nn.Linear(d, 3 * d)
        self.attn["proj"] = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.ModuleDict()
        self.mlp["fc1"] = nn.Linear(d, 4 * d)
        self.mlp["fc2"] = nn.Linear(4 * d, d)
        self.h = h

    def forward(self, x):
        b, n, d = x.shape
        y = self.norm1(x)
        qkv = self.attn["qkv"](y).reshape(b, n, 3, self.h, d // self.h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(1, 2); k = k.transpose(1, 2); v = v.transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / (d // self.h) ** 0.5, -1)
        y = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn["proj"](y)
        x = x + self.mlp["fc2"](torch.nn.functional.gelu(
            self.mlp["fc1"](self.norm2(x))))
        return x


class _TorchViT(nn.Module):
    def __init__(self, d=64, depth=2, h=2, p=16, size=32):
        super().__init__()
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, d, p, p)})
        n = (size // p) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList([_TorchBlock(d, h) for _ in range(depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


def test_import_torch_vit_matches_forward():
    torch.manual_seed(0)
    tm = _TorchViT()
    tm.eval()
    sd = tm.state_dict()

    jm = VisionTransformer(image_size=32, patch_size=16, in_channels=3,
                           embed_dim=64, depth=2, num_heads=2,
                           drop_path_rate=0.0, pool="cls")
    v = jm.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)))
    params = import_torch_vit(sd, v["params"], depth=2)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SwinV2 import — validated against the timm-architecture torch shim
# ---------------------------------------------------------------------------

def test_import_torch_swin_forward_parity():
    """import_torch_swin must map a timm SwinV2 state dict so our backbone
    reproduces the torch forward exactly (fp32). Covers qkv+q/v-bias, cosine
    logit_scale, CPB MLP, shifted-window masks, PatchMerging chunk-order
    permutation, and the timm start-of-stage → our end-of-stage downsample
    renumbering."""
    from fedvit_tpu.models.import_weights import import_torch_swin
    from fedvit_tpu.models.swin import SwinTransformerV2
    from tests.reference_oracle import _ShimSwinV2

    torch.manual_seed(0)
    depths, heads = (1, 2), (2, 4)
    tm = _ShimSwinV2(img_size=32, patch=4, dim=16, depths=depths,
                     heads=heads, window=4)
    tm.eval()

    ours = SwinTransformerV2(image_size=32, patch_size=4, in_channels=3,
                             embed_dim=16, depths=depths, num_heads=heads,
                             window_size=4, drop_path_rate=0.0)
    variables = ours.init({"params": jax.random.key(0)},
                          jnp.zeros((1, 32, 32, 3)))
    params = import_torch_swin(tm.state_dict(), variables["params"], depths)

    rng = np.random.default_rng(42)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.copy()).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_expand_patch_embed_swin():
    """4-channel surgery (reference model.py:150-166) on the Swin patch
    embed: 4th-channel rows = RGB mean, zero-mask input reproduces 3-ch."""
    from fedvit_tpu.models.swin import SwinTransformerV2

    m3 = SwinTransformerV2(image_size=32, patch_size=4, in_channels=3,
                           embed_dim=16, depths=(1,), num_heads=(2,),
                           window_size=4, drop_path_rate=0.0)
    v3 = m3.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)))
    p4 = expand_patch_embed_in_channels(v3["params"], 3, 4)
    w4 = np.asarray(p4["patch_embed"]["kernel"]).reshape(16, 4, 16)
    w3 = np.asarray(v3["params"]["patch_embed"]["kernel"]).reshape(16, 3, 16)
    assert np.allclose(w4[:, :3], w3)
    assert np.allclose(w4[:, 3], w3.mean(axis=1))

    m4 = SwinTransformerV2(image_size=32, patch_size=4, in_channels=4,
                           embed_dim=16, depths=(1,), num_heads=(2,),
                           window_size=4, drop_path_rate=0.0)
    rng = np.random.default_rng(1)
    x3 = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    x4 = np.concatenate([x3, np.zeros_like(x3[..., :1])], axis=-1)
    o3 = m3.apply(v3, jnp.asarray(x3))
    o4 = m4.apply({"params": p4}, jnp.asarray(x4))
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4), atol=1e-5)
