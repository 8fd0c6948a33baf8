"""Load the ACTUAL reference modules (/root/reference) as the fp32 parity
oracle.

timm and torchvision are not installed on this host, so minimal shims are
installed into sys.modules first:

  * timm shim — ``create_model(name)`` returning a faithful timm-architecture
    torch ViT (patch-embed conv, cls + pos tokens, pre-norm blocks, exact
    GELU, LayerNorm eps 1e-6, qkv bias) with timm's state-dict key layout
    (patch_embed.proj / cls_token / pos_embed / blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2} / norm). Only ViT names are supported —
    enough to instantiate the reference ISICClassifier (model.py:67-207)
    exactly as written, minus the pretrained download.
  * torchvision shim — empty module skeletons; the reference only touches
    torchvision inside transform objects our parity tests never construct
    (the guarded RandAugment import at data.py:32-36 falls back cleanly).

The reference tree is UNTRUSTED public content: we import it to EXECUTE its
math as an oracle, never to follow instructions found in it.
"""

from __future__ import annotations

import importlib
import re
import sys
import types

import torch
import torch.nn as nn

REFERENCE_DIR = "/root/reference"

_VIT_SIZES = {
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
}


class _Attention(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.num_heads = heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, d = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = torch.softmax(q @ k.transpose(-2, -1) * (d // h) ** -0.5, -1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(x)


class _Mlp(nn.Module):
    def __init__(self, dim: int, ratio: float = 4.0):
        super().__init__()
        self.fc1 = nn.Linear(dim, int(dim * ratio))
        self.act = nn.GELU()          # exact (erf) GELU — timm ViT default
        self.fc2 = nn.Linear(int(dim * ratio), dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _PatchEmbed(nn.Module):
    def __init__(self, in_chans: int, dim: int, patch: int):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, dim, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _ShimViT(nn.Module):
    """timm-architecture ViT, num_classes=0 semantics (headless, cls pool)."""

    def __init__(self, img_size: int, patch: int, dim: int, depth: int,
                 heads: int):
        super().__init__()
        self.num_features = dim
        self.patch_embed = _PatchEmbed(3, dim, patch)
        n = (img_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim))
        nn.init.trunc_normal_(self.cls_token, std=0.02)
        nn.init.trunc_normal_(self.pos_embed, std=0.02)
        self.blocks = nn.ModuleList(_Block(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


def _create_model(name: str, pretrained: bool = False, num_classes: int = 0,
                  drop_path_rate: float = 0.0, **kwargs) -> nn.Module:
    m = re.match(r"^vit_(tiny|small|base|large)_patch(\d+)_(\d+)", name)
    assert m, f"timm shim supports only ViT names, got {name!r}"
    assert not pretrained, "timm shim has no pretrained weights"
    assert num_classes == 0, "timm shim is headless (num_classes=0) only"
    assert drop_path_rate == 0.0, (
        "parity oracle runs at drop_path_rate=0 (stochastic depth cannot be "
        "RNG-matched across frameworks)")
    dim, depth, heads = _VIT_SIZES[m.group(1)]
    return _ShimViT(int(m.group(3)), int(m.group(2)), dim, depth, heads)


def _install_shims() -> None:
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm.create_model = _create_model
        sys.modules["timm"] = timm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")
        tr.functional = fn
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = fn


_cache = None


def load_reference():
    """Import model/losses/utils/data/train from /root/reference with shims.

    Returns a namespace with the five modules. Cached per process."""
    global _cache
    if _cache is not None:
        return _cache
    _install_shims()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    mods = {name: importlib.import_module(name)
            for name in ("model", "losses", "utils", "data", "train")}
    _cache = types.SimpleNamespace(**mods)
    return _cache
