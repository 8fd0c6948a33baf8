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


# ---------------------------------------------------------------------------
# File-level import — torch/timm weights file → our ISICClassifier variables
#
# The deployable form of the reference's production path: config.yaml:31 sets
# `pretrained: true`, timm downloads the checkpoint, and
# `_modify_input_channels` widens the patch embed to 4 channels
# (model.py:112-124,150-166). On a TPU host the download happens elsewhere;
# these functions take the resulting FILE and produce our param pytrees.
# ---------------------------------------------------------------------------

def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Read a torch `.pt`/`.pth`/`.bin`, `.safetensors`, or `.npz` weights
    file into a flat {name: np.ndarray} state dict (no torch tensors leak
    out, so the rest of the pipeline never needs torch at runtime)."""
    p = str(path)
    if p.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(p))
    if p.endswith(".npz"):
        return dict(np.load(p))
    import torch
    obj = torch.load(p, map_location="cpu", weights_only=True)
    return {k: _to_np(v) for k, v in _unwrap_state_dict(obj).items()}


def _unwrap_state_dict(obj) -> Dict[str, Any]:
    """Unwrap the containers real checkpoints ship in: {"state_dict": ...},
    {"model": ...} (timm's hub format), DDP "module." prefixes."""
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in obj.items()}


def expand_source_patch_embed(sd: Dict[str, np.ndarray], new_in: int = 4
                              ) -> Dict[str, np.ndarray]:
    """The reference's `_modify_input_channels` surgery (model.py:150-166)
    applied to the SOURCE torch conv kernel (D, C, P, P): RGB kernels kept,
    each extra channel initialized to the mean of the RGB kernels."""
    key = "patch_embed.proj.weight"
    if key not in sd:
        return sd
    w = np.asarray(sd[key])
    if w.ndim != 4 or w.shape[1] >= new_in:
        return sd
    mean = w.mean(axis=1, keepdims=True)
    extra = np.repeat(mean, new_in - w.shape[1], axis=1)
    out = dict(sd)
    out[key] = np.concatenate([w, extra], axis=1)
    return out


def resample_vit_pos_embed(pos: np.ndarray, n_tokens_new: int) -> np.ndarray:
    """Bicubic-resample a ViT absolute position embedding (1, 1+N, D) to a
    new grid (1, 1+M, D), cls token kept — timm's `resample_abs_pos_embed`
    semantics, so e.g. a 224px checkpoint can initialize a 384px model."""
    import jax
    import jax.numpy as jnp_
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    g_old = int(round(float(np.sqrt(grid.shape[1]))))
    g_new = int(round(float(np.sqrt(n_tokens_new))))
    assert g_old * g_old == grid.shape[1], "non-square source pos-embed grid"
    assert g_new * g_new == n_tokens_new, "non-square target pos-embed grid"
    if g_old == g_new:
        return pos
    d = grid.shape[-1]
    resized = jax.image.resize(jnp_.asarray(grid.reshape(1, g_old, g_old, d),
                                            jnp_.float32),
                               (1, g_new, g_new, d), method="bicubic")
    return np.concatenate([cls_tok,
                           np.asarray(resized).reshape(1, g_new * g_new, d)],
                          axis=1)


def _derive_depths(sd: Dict[str, np.ndarray]):
    """Infer the backbone architecture from the state-dict keys themselves:
    ViT → depth (int), SwinV2 → per-stage depths (tuple)."""
    import re
    if any(k.startswith("layers.") for k in sd):
        stages: Dict[int, int] = {}
        for k in sd:
            m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.", k)
            if m:
                s, b = int(m.group(1)), int(m.group(2))
                stages[s] = max(stages.get(s, 0), b + 1)
        return tuple(stages[s] for s in sorted(stages))
    depth = 0
    for k in sd:
        m = re.match(r"blocks\.(\d+)\.", k)
        if m:
            depth = max(depth, int(m.group(1)) + 1)
    return depth


def import_pretrained_file(sd: Dict[str, np.ndarray], cfg,
                           variables: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a loaded state dict onto freshly-initialized ISICClassifier
    `variables` for `cfg`. Handles both source flavors:

      * a bare timm BACKBONE checkpoint (keys `patch_embed.*`, `blocks.*` /
        `layers.*`) — backbone imported, head/metadata keep their fresh
        init (exactly what the reference gets from timm.create_model with
        a fresh classifier, model.py:112-145);
      * a full reference ISICClassifier state dict (keys `backbone.*`,
        `classifier.*`, `metadata_branch.*`) — everything imported.

    Applies the 4-channel patch-embed surgery when cfg feeds masks and the
    source is RGB, and resamples the ViT pos-embed when the image size
    differs from the checkpoint's."""
    in_ch = 4 if cfg.data.use_segmentation_mask else 3

    if any(k.startswith("backbone.") for k in sd):        # full classifier
        bb = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}
        bb = expand_source_patch_embed(bb, in_ch)
        if "pos_embed" in bb:
            tgt = variables["params"]["backbone"]["pos_embed"]
            bb["pos_embed"] = resample_vit_pos_embed(
                np.asarray(bb["pos_embed"]), tgt.shape[1] - 1)
        full = {k: v for k, v in sd.items() if not k.startswith("backbone.")}
        full.update({"backbone." + k: v for k, v in bb.items()})
        return import_torch_isic(full, variables, _derive_depths(bb))

    sd = expand_source_patch_embed(sd, in_ch)
    params = dict(variables["params"])
    depths = _derive_depths(sd)
    if isinstance(depths, tuple):                          # Swin backbone
        params["backbone"] = import_torch_swin(sd, params["backbone"], depths)
    else:
        if "pos_embed" in sd:
            tgt = params["backbone"]["pos_embed"]
            sd = dict(sd)
            sd["pos_embed"] = resample_vit_pos_embed(
                np.asarray(sd["pos_embed"]), tgt.shape[1] - 1)
        params["backbone"] = import_torch_vit(sd, params["backbone"], depths)
    out = dict(variables)
    out["params"] = params
    return out
