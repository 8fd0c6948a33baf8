"""SwinV2 backbone — native JAX implementation of the reference's production
model family (timm "swinv2_large_window12to24_192to384", reference
config.yaml:28, model.py:112-117).

SwinV2 specifics implemented (Liu et al. 2022, timm semantics):
  * post-norm blocks: x + DropPath(norm(attn(x))), x + DropPath(norm(mlp(x)))
  * scaled cosine attention: sim(q̂, k̂)·exp(clamp(logit_scale, ≤ log 100))
    with a learned per-head logit scale
  * continuous log-spaced relative-position bias: MLP(2→512→heads) over the
    log-CPB coordinate table, 16·sigmoid(·), supporting window-size scaling
    (the "window12to24" trained-12/finetuned-24 scheme: the table is
    normalized by the PRETRAINED window extent)
  * shifted windows with the static cross-boundary attention mask
  * PatchMerging v2 order (reduction Linear(4C→2C) then norm)
  * window size clamps to the stage resolution (stage 4 @384 is 12×12 < 24)

Layout: tokens kept as (B, H, W, C) between blocks (NHWC, XLA-native);
window partition is a WINDOW-MAJOR reshape/transpose to (nW·B, w², C) flat
rows, so every attention call is the fused flat windowed kernel
(ops/flash_attention.flash_attention_bias_flat) with zero re-layout: the
CPB rel-pos bias (H, n, n) and static shift mask (nW, n, n) enter as
SEPARATE kernel inputs added to the scores in-kernel (the (nW, H, n, n)
combined bias never materializes in HBM), dBias accumulates across the
window×batch grid in VMEM, and the learned cosine scale is folded into q
so its gradient flows through XLA.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fedvit_tpu.ops.layer_norm import LayerNorm
from fedvit_tpu.models.layers import DropPath, Mlp, trunc_normal_init
from fedvit_tpu.ops.attention import windowed_attention_flat


# ---------------------------------------------------------------------------
# Static window helpers (pure numpy — computed at trace time)
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, w: int, major: bool = False
                     ) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, w², C) (batch-major) or (nW·B, w², C)
    (window-major, `major=True` — rows of one window contiguous, the layout
    the fused windowed kernel consumes without any re-layout)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose((1, 3, 0, 2, 4, 5) if major else (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, w * w, c)


def window_unpartition(x: jnp.ndarray, w: int, h: int, wd: int,
                       major: bool = False) -> jnp.ndarray:
    """Inverse of window_partition."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // w) * (wd // w))
    if major:
        x = x.reshape(h // w, wd // w, b, w, w, c)
        x = x.transpose(2, 0, 3, 1, 4, 5)
    else:
        x = x.reshape(b, h // w, wd // w, w, w, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, c)


def relative_coords_table(window: int, pretrained_window: int = 0
                          ) -> np.ndarray:
    """SwinV2 log-spaced CPB input table (1, 2w−1, 2w−1, 2)."""
    rh = np.arange(-(window - 1), window, dtype=np.float64)
    rw = np.arange(-(window - 1), window, dtype=np.float64)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1)[None]
    denom = (pretrained_window - 1) if pretrained_window > 0 else (window - 1)
    denom = max(denom, 1)
    table = table / denom
    table = table * 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.astype(np.float32)


def relative_position_index(window: int) -> np.ndarray:
    """(w², w²) indices into the flattened (2w−1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)                           # (2, w²)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, w², w²)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += window - 1
    rel[..., 1] += window - 1
    rel[..., 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)                    # (w², w²)


def expand_bias_table(table: jnp.ndarray, window: int) -> jnp.ndarray:
    """(2w−1, 2w−1, H) bias table → (H, w², w²) per-pair bias.

    Equivalent to `table.reshape(-1, H)[relative_position_index(w)]` but
    built from the block-Toeplitz structure with STATIC SLICES ONLY — no
    gather (whose VJP is a ~2 ms scatter-add per block; 49 ms/step
    measured on SwinV2-L@384) and no large transpose (the previous
    stack-based expansion permuted a (w,w,w,w,H) f32 intermediate —
    ~32 MB moved at ~109 GiB/s per stage-3 block, ~25 ms/step of pure
    data formatting in the round-2 trace).

    Structure: bias[h, (yi,xi), (yj,xj)] = table[yi−yj+w−1, xi−xj+w−1, h].
    As a (w×w)-block matrix over (yi, yj), block (yi, yj) depends only on
    yi−yj — block-Toeplitz with 2w−1 distinct (w, w) blocks. With the
    delta axis REVERSED, the blocks a row-block yi needs are the
    contiguous slice [w−1−yi : 2w−1−yi], so laying the reversed blocks
    out along one flat (2w−1)·w axis makes every row-block of the final
    bias a single static lane-slice of width w² — each slice already in
    the kernel's (row-major (yi,xi), (yj,xj)) layout, so the stack writes
    the (H, w², w²) output directly with zero relayout."""
    w = window
    h = table.shape[-1]
    # inner Toeplitz (x-delta): M[a, xi, xj, h] = table[a, xi−xj+w−1, h]
    # via the same reversed-slice trick one level down (small: (2w−1)·w²·H)
    trev = table[:, ::-1]                                  # b'' = 2w−2−b
    m = jnp.stack([trev[:, w - 1 - xi: 2 * w - 1 - xi] for xi in range(w)],
                  axis=1)                                  # (2w−1, w, w, H)
    # lay out as (H, w=xi, (2w−1)·w) with the y-delta axis REVERSED so row
    # slices below are contiguous: Mflat[h, xi, a''·w + xj] with a'' = 2w−2−a
    m = m[::-1].transpose(3, 1, 0, 2)                      # (H, w, 2w−1, w)
    mflat = m.reshape(h, w, (2 * w - 1) * w)
    # outer Toeplitz (y-delta): row-block yi = lane slice starting at
    # (w−1−yi)·w, width w² — already (xi, xj·...) row-major
    rows = jnp.stack(
        [jax.lax.slice_in_dim(mflat, (w - 1 - yi) * w,
                              (w - 1 - yi) * w + w * w, axis=2)
         for yi in range(w)], axis=1)                      # (H, w, w, w²)
    return rows.reshape(h, w * w, w * w)


def shift_attention_mask(h: int, w: int, window: int, shift: int
                         ) -> Optional[np.ndarray]:
    """Additive (nW, w², w²) mask for shifted windows (−100 across region
    boundaries), or None for shift 0. Static numpy (Swin's img_mask trick)."""
    if shift == 0:
        return None
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    # partition (numpy mirror of window_partition)
    x = img.reshape(1, h // window, window, w // window, window, 1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = x[:, None, :] - x[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class WindowAttentionV2(nn.Module):
    """Scaled-cosine window attention with continuous rel-pos bias."""
    num_heads: int
    window: int
    pretrained_window: int = 0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (nW·B, w², C) WINDOW-MAJOR; mask: static (nW, w², w²) or None.

        Everything stays in the flat (rows, tokens, lanes) layout — head
        bias adds, cosine normalization (via head-segment one-hot matmuls)
        and the fused windowed attention all avoid (…, H, d) intermediates,
        whose (h, 32)-minor tiling forces relayouts on TPU."""
        bnw, n, c = x.shape
        h = self.num_heads
        d = c // h

        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        # SwinV2 uses q/v bias but no k bias (timm: q_bias, v_bias)
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        q = qkv[..., :c] + q_bias.astype(qkv.dtype)
        k = qkv[..., c:2 * c]
        v = qkv[..., 2 * c:] + v_bias.astype(qkv.dtype)

        # cosine attention: per-head L2 norms on the flat layout — sum of
        # squares per 64·h-aligned lane segment via a static one-hot matmul
        # (C, H), broadcast back with its transpose. Two round-3 NEGATIVE
        # results keep this the XLA-side formulation:
        #  * padding the one-hot to 128 lanes: 223.9 vs 220.3 ms/step
        #    (bandwidth, not lane alignment, is the ≈12 ms cost);
        #  * fusing the normalization INTO the Pallas kernel
        #    (ops/attention.windowed_cosine_attention_flat): the kernel's
        #    serial in-program VPU norm chain inflated attention custom-call
        #    time 189→319 ms per 3-step trace (+44 ms/step) — far more than
        #    the 12 ms XLA-side cost it removed.
        seg = jnp.asarray(np.repeat(np.eye(h, dtype=np.float32), d, axis=0))
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
            (h, 1, 1))
        scale = jnp.exp(jnp.clip(logit_scale, max=float(np.log(100.0))))

        def inv_norm(t, head_scale=None):
            # sum of squares in f32 (the small (B, N, H) reduction needs the
            # headroom), but the EXPANSION back to (B, N, C) and the multiply
            # run in the compute dtype: in f32 they materialized two extra
            # (W0·B, N, C) f32 arrays per q/k (~226 MB at stage 1) that the
            # trace showed as pure-bandwidth fusions + f32→bf16 conversions
            # (~3.7 ms/step). The one-hot expansion copies values exactly;
            # the only cost is rounding 1/‖x‖ itself to bf16 — the same
            # magnitude as the per-element q̂ rounding already incurred.
            ss = jnp.einsum("bnc,ch->bnh", t.astype(jnp.float32) ** 2, seg)
            inv = 1.0 / jnp.clip(jnp.sqrt(ss), min=1e-6)
            if head_scale is not None:
                inv = inv * head_scale.reshape(1, 1, h)
            return jnp.einsum("bnh,ch->bnc", inv.astype(t.dtype),
                              seg.astype(t.dtype))

        # fold the learned per-head cosine scale into q (|q·s| scales away in
        # the normalization, so applying it with the same lane pass is exact)
        qn = (q * inv_norm(q, head_scale=scale)).astype(v.dtype)
        kn = (k * inv_norm(k)).astype(v.dtype)

        # continuous relative position bias — sigmoid on the small
        # (2w−1)² table, then the Toeplitz slice/stack expansion (no gather;
        # see expand_bias_table)
        table = relative_coords_table(self.window, self.pretrained_window)
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(
            jnp.asarray(table))
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=jnp.float32,
                       name="cpb_fc2")(cpb)                  # (1,2w-1,2w-1,H)
        cpb = 16.0 * jax.nn.sigmoid(cpb[0])                  # (2w-1,2w-1,H)
        bias = expand_bias_table(cpb, self.window)       # (H, w², w²)

        out = windowed_attention_flat(
            qn, kn, v, bias,
            jnp.asarray(mask) if mask is not None else None,
            h, impl=self.attention_impl)
        return nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="proj")(out)


class SwinBlockV2(nn.Module):
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    pretrained_window: int = 0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        b, h, w, c = x.shape
        if self.window >= min(h, w):
            win, shift = min(h, w), 0   # window covers the map → no shift
        else:
            win, shift = self.window, self.shift

        assert h % win == 0 and w % win == 0, (
            f"feature map {h}x{w} not divisible by window {win}")
        shortcut = x
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = shift_attention_mask(h, w, win, shift)
        xw = window_partition(x, win, major=True)
        xw = WindowAttentionV2(self.num_heads, win, self.pretrained_window,
                               self.dtype, self.attention_impl,
                               name="attn")(xw, mask, deterministic)
        x = window_unpartition(xw, win, h, w, major=True)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        # post-norm (v2)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = shortcut + DropPath(self.drop_path)(x, deterministic)

        y = Mlp(int(c * self.mlp_ratio), dropout=0.0, dtype=self.dtype,
                name="mlp")(x, deterministic)
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x


class _MergeReduction(nn.Module):
    """PatchMerging's 4c→2c projection: space-to-depth + matmul, or a
    2×2/stride-2 NHWC conv (FEDVIT_MERGE_CONV=1) — mathematically equal.

    Holds the kernel as the flat (4c, 2c) Dense parameter (`kernel`) so the
    parameter tree is bit-identical across both formulations (torch
    import/checkpoints unaffected).

    The conv form deletes the explicit reshape→transpose→reshape (1.9
    ms/step of relayout copies on SwinV2-L@384, round-5 trace) — but the
    same trace shows the conv's layout preferences LEAK into the
    surrounding graph: new relayout copies appear at the DropPath backward
    (+1.15 ms, {3,0,2,1} cotangents), the stage-0 LayerNorm convert
    (0.23 → 1.13 ms) and the attn-proj add (0.28 → 0.85 ms), for a NET
    copy-bucket loss (13.9 → 16.1 ms/step). Default stays the explicit
    space-to-depth whose copies at least stay local."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param("kernel", trunc_normal_init, (4 * c, 2 * c))
        if os.environ.get("FEDVIT_MERGE_CONV", "0") == "1":
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.reshape(2, 2, c, 2 * c).astype(self.dtype),
                window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, _ = x.shape
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return (y.astype(self.dtype) @ kernel.astype(self.dtype))


class PatchMergingV2(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # The 2×2 space-to-depth + Dense(4c→2c) IS a 2×2/stride-2 conv: the
        # explicit reshape→transpose→reshape cost 1.9 ms/step of relayout
        # copies on SwinV2-L@384 (round-5 trace, swin.py:299-300 rows), while
        # the conv emitter folds the neighborhood read into its matmul tiling
        # with no HBM pass. Param tree unchanged — `reduction/kernel` stays
        # the (4c, 2c) Dense layout (torch import/checkpoints unaffected);
        # it is reshaped at trace time to HWIO (2, 2, c, 2c), whose
        # (i, j, ch) flattening matches the old (…, 2, 2, c)→4c concat
        # order exactly (exactness pinned in test_models.py).
        y = _MergeReduction(dtype=self.dtype, name="reduction")(x)
        return LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class SwinStage(nn.Module):
    """One resolution stage: `depth` blocks + optional downsample.

    Named `layers_{i}` under the backbone so the LLRD group mapping
    (train/optim.llrd_scale_tree, reference model.py:253-256) sees the same
    per-stage structure the reference iterates over."""
    depth: int
    num_heads: int
    window: int
    mlp_ratio: float
    drop_paths: Tuple[float, ...]
    pretrained_window: int
    downsample: bool
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        block_cls = (nn.remat(SwinBlockV2, static_argnums=(2,))
                     if self.remat else SwinBlockV2)
        for blk in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                window=self.window,
                shift=0 if blk % 2 == 0 else self.window // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_paths[blk],
                pretrained_window=self.pretrained_window,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                name=f"blocks_{blk}")(x, deterministic)
        if self.downsample:
            x = PatchMergingV2(self.dtype, name="downsample")(x)
        return x


class SwinTransformerV2(nn.Module):
    image_size: int = 384
    patch_size: int = 4
    in_channels: int = 3
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 24
    pretrained_window_sizes: Tuple[int, ...] = (0, 0, 0, 0)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    remat: bool = False

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        x = x.astype(self.dtype)
        # patch embed (reshape + Dense, like models/vit.PatchEmbed) + norm
        hh, ww = x.shape[1] // p, x.shape[2] // p
        x = x.reshape(b, hh, p, ww, p, x.shape[-1])
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init,
                     name="patch_embed")(x)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(1, total - 1)
               for i in range(total)]
        di = 0
        for s, depth in enumerate(self.depths):
            x = SwinStage(
                depth=depth,
                num_heads=self.num_heads[s],
                window=self.window_size,
                mlp_ratio=self.mlp_ratio,
                drop_paths=tuple(dpr[di:di + depth]),
                pretrained_window=self.pretrained_window_sizes[s],
                downsample=(s < len(self.depths) - 1),
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                remat=self.remat,
                name=f"layers_{s}")(x, deterministic)
            di += depth

        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feats = x.reshape(b, -1, x.shape[-1]).mean(axis=1)  # global avg pool
        return feats.astype(jnp.float32)


SWIN_CONFIGS = {
    "tiny":  dict(embed_dim=96,  depths=(2, 2, 6, 2),
                  num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96,  depths=(2, 2, 18, 2),
                  num_heads=(3, 6, 12, 24)),
    "base":  dict(embed_dim=128, depths=(2, 2, 18, 2),
                  num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2),
                  num_heads=(6, 12, 24, 48)),
}
