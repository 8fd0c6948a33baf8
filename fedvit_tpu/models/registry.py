"""Backbone registry — timm-style names → native JAX backbones.

Replaces `timm.create_model(...)` (reference model.py:112-117). Accepts the
backbone names the reference configs use:
  * "vit_{size}_patch{P}_{res}"                        → VisionTransformer
  * "swinv2_large_window12to24_192to384.ms_in22k_ft_in1k",
    "swin_small_patch4_window12_384", ...              → SwinTransformerV2
  * "eva02_small_patch14_336.mim_in22k_ft_in1k"        → ViT-class (EVA is a
    ViT variant; mapped onto our ViT with the matching patch/size)

Pretrained-weight download is network-bound and out of scope on this host;
`pretrained=True` is accepted and ignored with a warning (weight import
helpers can load converted checkpoints via train/checkpoint.py).
"""

from __future__ import annotations

import re
import warnings
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from fedvit_tpu.models.vit import VIT_CONFIGS, VisionTransformer

BACKBONE_SPECS: Dict[str, Dict[str, Any]] = {
    # explicit entries for exact reference config names
    "swinv2_large_window12to24_192to384.ms_in22k_ft_in1k": dict(
        family="swinv2", embed_dim=192, depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 48), window_size=24,
        pretrained_window_sizes=(12, 12, 12, 6)),
    "swin_small_patch4_window12_384": dict(
        family="swin", embed_dim=96, depths=(2, 2, 18, 2),
        num_heads=(3, 6, 12, 24), window_size=12),
}

_VIT_RE = re.compile(r"^(vit|deit|eva02?)_(tiny|small|base|large|huge)_patch(\d+)(?:_(\d+))?")


def _dtype(name: str) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


def build_backbone(name: str, image_size: int, in_channels: int = 3,
                   drop_path_rate: float = 0.1, pool: str = "cls",
                   compute_dtype: str = "float32",
                   attention_impl: str = "auto",
                   pretrained: bool = False,
                   remat: bool = False) -> Tuple[Any, int]:
    """Returns (module, num_features)."""
    if pretrained:
        warnings.warn(
            "pretrained=True: no network access for weight download; "
            "initializing randomly. Convert a timm/torch weights file with "
            "`python -m fedvit_tpu.cli.import_weights` and point "
            "model.pretrained_path at the result to start from it.")

    m = _VIT_RE.match(name)
    if m:
        size = m.group(2)
        patch = int(m.group(3))
        cfg = VIT_CONFIGS[size]
        mod = VisionTransformer(
            image_size=image_size, patch_size=patch, in_channels=in_channels,
            drop_path_rate=drop_path_rate, pool=pool, dtype=_dtype(compute_dtype),
            attention_impl=attention_impl, remat=remat, **cfg)
        return mod, cfg["embed_dim"]

    if name.startswith("swin"):
        from fedvit_tpu.models.swin import SwinTransformerV2, SWIN_CONFIGS
        spec = BACKBONE_SPECS.get(name)
        if spec is None:
            sm = re.match(r"^swin(?:v2)?_(tiny|small|base|large)", name)
            if not sm:
                raise ValueError(f"Unknown swin backbone: {name}")
            spec = dict(SWIN_CONFIGS[sm.group(1)])
            spec["family"] = "swinv2"
            wm = re.search(r"window(\d+)(?:to(\d+))?", name)
            if wm:
                spec["window_size"] = int(wm.group(2) or wm.group(1))
        spec = dict(spec)
        spec.pop("family", None)
        mod = SwinTransformerV2(
            image_size=image_size, in_channels=in_channels,
            drop_path_rate=drop_path_rate, dtype=_dtype(compute_dtype),
            attention_impl=attention_impl, remat=remat, **spec)
        return mod, mod.num_features

    raise ValueError(f"Unknown backbone: {name}")
