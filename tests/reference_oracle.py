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


# --- SwinV2 shim (timm swin_transformer_v2 architecture + key layout) ------
#
# Faithful to timm: qkv Linear without bias + separate q_bias/v_bias, learned
# per-head logit_scale (init log 10, clamped at log 100), cosine attention,
# cpb_mlp (2→512→heads, ReLU, no bias on fc2) over the log-CPB table,
# 16·sigmoid bias, post-norm blocks, PatchMerging at the START of stages 1..3
# with (h_off, w_off) chunk order [(0,0),(1,0),(0,1),(1,1)], window clamped to
# the stage resolution.
#
# The geometry tables below are DIRECT TORCH TRANSCRIPTIONS of timm's
# swin_transformer_v2.py (WindowAttention.__init__ buffer construction and
# the window_partition/reverse/mask helpers), written against timm's
# published semantics and deliberately NOT importing fedvit_tpu.models.swin
# — so a shared misunderstanding of timm's layout in our JAX model cannot
# silently pass both sides of the parity tests (round-2 VERDICT item 7).

import math

import numpy as np
import torch.nn.functional as F


def _timm_relative_coords_table(window, pretrained_window):
    """timm SwinV2 log-CPB input table (1, 2w−1, 2w−1, 2).

    Transcribed: meshgrid of h/w deltas, normalized by the PRETRAINED
    window extent minus one when given (the window12to24 fine-tune
    scheme), else the current window; ×8, then sign·log2(|·|+1)/log2(8)."""
    rh = torch.arange(-(window - 1), window, dtype=torch.float64)
    rw = torch.arange(-(window - 1), window, dtype=torch.float64)
    table = torch.stack(torch.meshgrid(rh, rw, indexing="ij"),
                        dim=-1).unsqueeze(0)             # (1, 2w−1, 2w−1, 2)
    if pretrained_window > 0:
        table[:, :, :, 0] /= pretrained_window - 1
        table[:, :, :, 1] /= pretrained_window - 1
    else:
        table[:, :, :, 0] /= max(window - 1, 1)
        table[:, :, :, 1] /= max(window - 1, 1)
    table = table * 8                                    # normalize to ±8
    table = (torch.sign(table) * torch.log2(torch.abs(table) + 1.0)
             / math.log2(8))
    return table.float()


def _timm_relative_position_index(window):
    """timm SwinV2 (w², w²) index into the flattened (2w−1)² table.

    Transcribed: pairwise coordinate deltas, shifted to [0, 2w−2], row
    delta scaled by (2w−1), then summed."""
    coords = torch.stack(torch.meshgrid(torch.arange(window),
                                        torch.arange(window),
                                        indexing="ij"))   # (2, w, w)
    flat = torch.flatten(coords, 1)                       # (2, w²)
    rel = flat[:, :, None] - flat[:, None, :]             # (2, w², w²)
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                    # (w², w²)


def _timm_shift_attention_mask(h, w, window, shift):
    """timm SwinV2 shifted-window attention mask (nW, w², w²), −100 across
    region boundaries; None when shift == 0. Transcribed img_mask trick:
    count regions over the three h/w slabs, partition into windows,
    pairwise-compare."""
    if shift == 0:
        return None
    img = torch.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = _torch_window_partition(img, window).view(-1, window * window)
    diff = mw.unsqueeze(1) - mw.unsqueeze(2)
    return (diff != 0).float() * -100.0


class _ShimSwinAttention(nn.Module):
    def __init__(self, dim, heads, window, pretrained_window):
        super().__init__()
        relative_coords_table = _timm_relative_coords_table
        relative_position_index = _timm_relative_position_index
        self.num_heads = heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones(heads, 1, 1)))
        self.cpb_mlp = nn.Sequential(nn.Linear(2, 512), nn.ReLU(),
                                     nn.Linear(512, heads, bias=False))
        self.proj = nn.Linear(dim, dim)
        self.register_buffer(
            "rct", relative_coords_table(window, pretrained_window),
            persistent=False)
        self.register_buffer(
            "rpi", relative_position_index(window), persistent=False)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        h = self.num_heads
        qkv_bias = torch.cat((self.q_bias, torch.zeros_like(self.v_bias),
                              self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b_, n, 3, h, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale, max=math.log(100.0)).exp()
        attn = attn * scale
        bias = self.cpb_mlp(self.rct).view(-1, h)[self.rpi.view(-1)]
        bias = bias.view(n, n, h).permute(2, 0, 1)
        attn = attn + 16.0 * torch.sigmoid(bias)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.view(b_, h, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


def _torch_window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.view(b, h // w, w, wd // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _torch_window_unpartition(x, w, h, wd):
    c = x.shape[-1]
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.view(b, h // w, wd // w, w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


class _ShimSwinBlock(nn.Module):
    def __init__(self, dim, heads, resolution, window, shift,
                 pretrained_window):
        super().__init__()
        if window >= min(resolution):
            window, shift = min(resolution), 0
        self.window, self.shift = window, shift
        self.resolution = resolution
        self.attn = _ShimSwinAttention(dim, heads, window, pretrained_window)
        self.norm1 = nn.LayerNorm(dim)
        self.mlp = _Mlp(dim)
        self.norm2 = nn.LayerNorm(dim)
        m = _timm_shift_attention_mask(resolution[0], resolution[1],
                                       window, shift)
        self.register_buffer("mask", m, persistent=False)

    def forward(self, x):
        h, w = self.resolution
        shortcut = x
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = _torch_window_partition(x, self.window)
        xw = self.attn(xw, self.mask)
        x = _torch_window_unpartition(xw, self.window, h, w)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + self.norm1(x)
        return x + self.norm2(self.mlp(x))


class _ShimPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.permute(0, 1, 3, 4, 2, 5).flatten(3)   # timm chunk order
        return self.norm(self.reduction(x))


class _ShimSwinStage(nn.Module):
    def __init__(self, dim, depth, heads, resolution, window,
                 pretrained_window, downsample):
        super().__init__()
        self.downsample = (_ShimPatchMerging(dim // 2) if downsample
                           else nn.Identity())
        self.blocks = nn.ModuleList(
            _ShimSwinBlock(dim, heads, resolution, window,
                           0 if i % 2 == 0 else window // 2,
                           pretrained_window)
            for i in range(depth))

    def forward(self, x):
        x = self.downsample(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class _ShimSwinV2(nn.Module):
    """timm-architecture SwinV2, num_classes=0 semantics (avg-pool head)."""

    def __init__(self, img_size, patch, dim, depths, heads, window,
                 pretrained_windows=None):
        super().__init__()
        pretrained_windows = pretrained_windows or (0,) * len(depths)
        self.num_features = dim * 2 ** (len(depths) - 1)
        self.patch_embed = _PatchEmbed(3, dim, patch)
        self.patch_embed.norm = nn.LayerNorm(dim)
        res = img_size // patch
        self.layers = nn.ModuleList()
        for s, depth in enumerate(depths):
            r = res // 2 ** s
            self.layers.append(_ShimSwinStage(
                dim * 2 ** s, depth, heads[s], (r, r), window,
                pretrained_windows[s], downsample=(s > 0)))
        self.norm = nn.LayerNorm(self.num_features)
        self.grid = res

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)                       # (B, N, C)
        x = self.patch_embed.norm(x)
        x = x.view(b, self.grid, self.grid, -1)
        for layer in self.layers:
            x = layer(x)
        x = self.norm(x)
        return x.flatten(1, 2).mean(1)


_SWIN_SIZES = {
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "large": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
}


def _create_model(name: str, pretrained: bool = False, num_classes: int = 0,
                  drop_path_rate: float = 0.0, **kwargs) -> nn.Module:
    assert not pretrained, "timm shim has no pretrained weights"
    assert num_classes == 0, "timm shim is headless (num_classes=0) only"
    assert drop_path_rate == 0.0, (
        "parity oracle runs at drop_path_rate=0 (stochastic depth cannot be "
        "RNG-matched across frameworks)")
    m = re.match(r"^vit_(tiny|small|base|large)_patch(\d+)_(\d+)", name)
    if m:
        dim, depth, heads = _VIT_SIZES[m.group(1)]
        return _ShimViT(int(m.group(3)), int(m.group(2)), dim, depth, heads)
    m = re.match(r"^swinv2_(tiny|small|base|large)_window(\d+)"
                 r"(?:to(\d+))?_(\d+)(?:to(\d+))?", name)
    assert m, f"timm shim supports only ViT/SwinV2 names, got {name!r}"
    dim, depths, heads = _SWIN_SIZES[m.group(1)]
    win = int(m.group(3) or m.group(2))               # window12to24 → 24
    img = int(m.group(5) or m.group(4))               # 192to384 → 384
    pretrained_windows = None
    if m.group(3):                                    # ft scheme: CPB tables
        pw = int(m.group(2))                          # normalized by the
        pretrained_windows = (pw, pw, pw, pw // 2)    # PRETRAINED extents
    return _ShimSwinV2(img, 4, dim, depths, heads, win, pretrained_windows)


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
