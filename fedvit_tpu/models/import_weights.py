"""Pretrained-weight import — torch/timm state-dicts → our param pytrees.

The reference relies on timm's pretrained download (model.py:112-117) and
performs 4-channel patch-embed surgery on the loaded conv: RGB weights are
kept, the 4th (mask) channel is initialized to the MEAN of the RGB kernels,
bias copied (model.py:150-166). This module provides:

  * expand_patch_embed_in_channels(params, ...) — the exact surgery, on our
    native ViT params (works on randomly-initialized or imported weights)
  * import_torch_vit(state_dict, params) — map a timm-style ViT state dict
    (torch tensors or numpy) onto our VisionTransformer param tree, for
    offline-converted checkpoints (no network on this host).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def expand_patch_embed_in_channels(params: Any, old_in: int = 3,
                                   new_in: int = 4,
                                   patch_size: int = 16) -> Any:
    """Widen a ViT patch-embed kernel from old_in to new_in channels.

    Our PatchEmbed kernel is a Dense of shape (P·P·C_in, D) over pixels laid
    out as (py, px, c) — channel fastest. New channels get the mean over the
    existing channels at the same pixel (reference model.py:159-162).
    """
    flat = traverse_util.flatten_dict(params)
    key = None
    for k in flat:
        if "patch_embed" in k and k[-1] == "kernel":
            key = k
            break
    assert key is not None, "no patch_embed kernel found"
    w = np.asarray(flat[key])
    d = w.shape[-1]
    pp = w.shape[0] // old_in
    assert pp * old_in == w.shape[0], (
        f"kernel rows {w.shape[0]} not divisible by in_channels {old_in}")
    w_pix = w.reshape(pp, old_in, d)
    mean = w_pix.mean(axis=1, keepdims=True)
    extra = np.repeat(mean, new_in - old_in, axis=1)
    w_new = np.concatenate([w_pix, extra], axis=1).reshape(pp * new_in, d)
    flat = dict(flat)
    flat[key] = jnp.asarray(w_new)
    return traverse_util.unflatten_dict(flat)


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def import_torch_vit(state_dict: Dict[str, Any], params: Any,
                     depth: int, patch_size: int = 16) -> Any:
    """Map a timm ViT state dict onto our VisionTransformer params.

    Handles: patch_embed conv → pixel-major Dense kernel, cls token,
    pos_embed, per-block qkv/proj/mlp/norms, final norm. Unmatched target
    leaves keep their current values; unconsumed source keys are returned is
    not — strictness is the caller's business (we assert on shape errors).
    """
    flat = dict(traverse_util.flatten_dict(params))

    def put(path, value):
        assert path in flat, f"target missing: {path}"
        assert flat[path].shape == value.shape, (
            f"{path}: {flat[path].shape} vs {value.shape}")
        flat[path] = jnp.asarray(value)

    sd = {k: _to_np(v) for k, v in state_dict.items()}

    # patch embed: torch conv (D, C, P, P) → rows (py, px, c) × D
    w = sd["patch_embed.proj.weight"]
    d_out, c_in, p, _ = w.shape
    w = w.transpose(2, 3, 1, 0).reshape(p * p * c_in, d_out)
    put(("patch_embed", "proj", "kernel"), w)
    put(("patch_embed", "proj", "bias"), sd["patch_embed.proj.bias"])
    put(("cls_token",), sd["cls_token"])
    put(("pos_embed",), sd["pos_embed"])

    for i in range(depth):
        tp = f"blocks.{i}."
        op = (f"blocks_{i}",)
        put(op + ("norm1", "scale"), sd[tp + "norm1.weight"])
        put(op + ("norm1", "bias"), sd[tp + "norm1.bias"])
        put(op + ("attn", "qkv", "kernel"), sd[tp + "attn.qkv.weight"].T)
        put(op + ("attn", "qkv", "bias"), sd[tp + "attn.qkv.bias"])
        put(op + ("attn", "proj", "kernel"), sd[tp + "attn.proj.weight"].T)
        put(op + ("attn", "proj", "bias"), sd[tp + "attn.proj.bias"])
        put(op + ("norm2", "scale"), sd[tp + "norm2.weight"])
        put(op + ("norm2", "bias"), sd[tp + "norm2.bias"])
        put(op + ("mlp", "Dense_0", "kernel"), sd[tp + "mlp.fc1.weight"].T)
        put(op + ("mlp", "Dense_0", "bias"), sd[tp + "mlp.fc1.bias"])
        put(op + ("mlp", "Dense_1", "kernel"), sd[tp + "mlp.fc2.weight"].T)
        put(op + ("mlp", "Dense_1", "bias"), sd[tp + "mlp.fc2.bias"])

    put(("norm", "scale"), sd["norm.weight"])
    put(("norm", "bias"), sd["norm.bias"])
    return traverse_util.unflatten_dict(flat)


def import_torch_swin(state_dict: Dict[str, Any], params: Any,
                      depths) -> Any:
    """Map a timm SwinV2 state dict onto our SwinTransformerV2 params.

    The reference's production checkpoint is SwinV2-L
    (/root/reference/config.yaml:28, loaded via timm at model.py:112-117).
    timm naming handled:
      * patch_embed.proj (conv) + patch_embed.norm → patch_embed (pixel-major
        Dense) + patch_norm
      * layers.{s}.blocks.{b}: qkv (no bias) + q_bias/v_bias, logit_scale,
        cpb_mlp.{0,2} → cpb_fc{1,2}, proj, norm1/2, mlp.fc1/2
      * layers.{s}.downsample (timm puts PatchMerging at the START of stage s)
        → our layers_{s-1}.downsample (merge at the END of stage s−1 — the
        same network position), with the 2×2 pixel-chunk order permuted from
        timm's (h_off, w_off) = [(0,0),(1,0),(0,1),(1,1)] to our row-major
        [(0,0),(0,1),(1,0),(1,1)]
      * final norm
    """
    flat = dict(traverse_util.flatten_dict(params))

    def put(path, value):
        assert path in flat, f"target missing: {path}"
        assert flat[path].shape == value.shape, (
            f"{path}: {flat[path].shape} vs {value.shape}")
        flat[path] = jnp.asarray(value)

    sd = {k: _to_np(v) for k, v in state_dict.items()}

    w = sd["patch_embed.proj.weight"]          # (D, C, p, p)
    d_out, c_in, p, _ = w.shape
    put(("patch_embed", "kernel"),
        w.transpose(2, 3, 1, 0).reshape(p * p * c_in, d_out))
    put(("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    put(("patch_norm", "scale"), sd["patch_embed.norm.weight"])
    put(("patch_norm", "bias"), sd["patch_embed.norm.bias"])

    for s, depth in enumerate(depths):
        for b in range(depth):
            tp = f"layers.{s}.blocks.{b}."
            op = (f"layers_{s}", f"blocks_{b}")
            a = op + ("attn",)
            put(a + ("qkv", "kernel"), sd[tp + "attn.qkv.weight"].T)
            put(a + ("q_bias",), sd[tp + "attn.q_bias"])
            put(a + ("v_bias",), sd[tp + "attn.v_bias"])
            put(a + ("logit_scale",), sd[tp + "attn.logit_scale"])
            put(a + ("cpb_fc1", "kernel"), sd[tp + "attn.cpb_mlp.0.weight"].T)
            put(a + ("cpb_fc1", "bias"), sd[tp + "attn.cpb_mlp.0.bias"])
            put(a + ("cpb_fc2", "kernel"), sd[tp + "attn.cpb_mlp.2.weight"].T)
            put(a + ("proj", "kernel"), sd[tp + "attn.proj.weight"].T)
            put(a + ("proj", "bias"), sd[tp + "attn.proj.bias"])
            for nrm in ("norm1", "norm2"):
                put(op + (nrm, "scale"), sd[tp + nrm + ".weight"])
                put(op + (nrm, "bias"), sd[tp + nrm + ".bias"])
            put(op + ("mlp", "Dense_0", "kernel"), sd[tp + "mlp.fc1.weight"].T)
            put(op + ("mlp", "Dense_0", "bias"), sd[tp + "mlp.fc1.bias"])
            put(op + ("mlp", "Dense_1", "kernel"), sd[tp + "mlp.fc2.weight"].T)
            put(op + ("mlp", "Dense_1", "bias"), sd[tp + "mlp.fc2.bias"])

        tm = f"layers.{s + 1}.downsample."     # timm: start of NEXT stage
        if tm + "reduction.weight" in sd:
            red = sd[tm + "reduction.weight"].T        # (4C, 2C)
            c4 = red.shape[0]
            chunks = red.reshape(4, c4 // 4, red.shape[1])
            red = chunks[[0, 2, 1, 3]].reshape(c4, red.shape[1])
            put((f"layers_{s}", "downsample", "reduction", "kernel"), red)
            put((f"layers_{s}", "downsample", "norm", "scale"),
                sd[tm + "norm.weight"])
            put((f"layers_{s}", "downsample", "norm", "bias"),
                sd[tm + "norm.bias"])

    put(("norm", "scale"), sd["norm.weight"])
    put(("norm", "bias"), sd["norm.bias"])
    return traverse_util.unflatten_dict(flat)


def import_torch_isic(state_dict: Dict[str, Any], variables: Dict[str, Any],
                      depth: int) -> Dict[str, Any]:
    """Map a full reference ISICClassifier state dict (model.py:67-207) onto
    our ISICClassifier variables: backbone (ViT, or SwinV2 — detected from
    the state-dict keys; pass `depth` as the block count for ViT or the
    per-stage depths tuple for Swin) + MetadataBranch
    (Linear→BN→GELU→Drop→Linear→BN→GELU, model.py:48-56) + classifier MLP
    (model.py:139-145). Returns {"params", "batch_stats"} ready for apply."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}

    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    params = dict(variables["params"])
    if any(k.startswith("layers.") for k in bb_sd):   # Swin backbone
        params["backbone"] = import_torch_swin(bb_sd, params["backbone"],
                                               depth)
    else:
        params["backbone"] = import_torch_vit(bb_sd, params["backbone"],
                                              depth)

    flat = dict(traverse_util.flatten_dict(params))
    stats = dict(traverse_util.flatten_dict(variables.get("batch_stats", {})))

    def put(tree, path, value):
        assert path in tree, f"target missing: {path}"
        assert tree[path].shape == value.shape, (
            f"{path}: {tree[path].shape} vs {value.shape}")
        tree[path] = jnp.asarray(value)

    # metadata branch: torch Sequential indices 0/1/4/5 → fc1/bn1/fc2/bn2
    if any(k.startswith("metadata_branch.") for k in sd):
        for t_idx, ours in (("0", "fc1"), ("4", "fc2")):
            put(flat, ("metadata_branch", ours, "kernel"),
                sd[f"metadata_branch.net.{t_idx}.weight"].T)
            put(flat, ("metadata_branch", ours, "bias"),
                sd[f"metadata_branch.net.{t_idx}.bias"])
        for t_idx, ours in (("1", "bn1"), ("5", "bn2")):
            put(flat, ("metadata_branch", ours, "scale"),
                sd[f"metadata_branch.net.{t_idx}.weight"])
            put(flat, ("metadata_branch", ours, "bias"),
                sd[f"metadata_branch.net.{t_idx}.bias"])
            put(stats, ("metadata_branch", ours, "mean"),
                sd[f"metadata_branch.net.{t_idx}.running_mean"])
            put(stats, ("metadata_branch", ours, "var"),
                sd[f"metadata_branch.net.{t_idx}.running_var"])

    # classifier: torch Sequential indices 0/3 → fc1/fc2
    for t_idx, ours in (("0", "fc1"), ("3", "fc2")):
        put(flat, ("classifier", ours, "kernel"),
            sd[f"classifier.{t_idx}.weight"].T)
        put(flat, ("classifier", ours, "bias"),
            sd[f"classifier.{t_idx}.bias"])

    return {"params": traverse_util.unflatten_dict(flat),
            "batch_stats": traverse_util.unflatten_dict(stats)}
