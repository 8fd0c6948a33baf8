"""Attention U-Net segmentation branch — old-gen capability.

Parity target: /root/reference/segmentation.py:23-270 —
  ConvBlock (double conv+BN+ReLU), AttentionGate (gating-signal spatial
  attention), UNetEncoder (4 stages + bottleneck at 2× channels),
  AttentionUNetDecoder (transpose-conv up + attention-gated skips + final
  1×1 → 1-channel mask), SegmentationBranch returning
  (mask, decoder_features, bottleneck).

NHWC throughout; bilinear resizes via jax.image.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """Conv→BN→ReLU ×2 (reference segmentation.py:23-44)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i+1}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             dtype=jnp.float32, name=f"bn{i+1}")(x)
            x = nn.relu(x)
        return x


class AttentionGate(nn.Module):
    """Spatial attention gate (reference segmentation.py:47-104)."""
    inter_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, gate, skip, deterministic: bool = True):
        b, h, w, _ = skip.shape
        gate_up = jax.image.resize(gate, (b, h, w, gate.shape[-1]),
                                   method="linear")
        g = nn.Conv(self.inter_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="W_g")(gate_up)
        g = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn_g")(g)
        x = nn.Conv(self.inter_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="W_x")(skip)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn_x")(x)
        psi = nn.relu(g + x)
        psi = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                      name="psi")(psi)
        psi = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                           dtype=jnp.float32, name="bn_psi")(psi)
        psi = jax.nn.sigmoid(psi)
        return skip * psi


class UNetEncoder(nn.Module):
    """(reference segmentation.py:111-151)"""
    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        feats = []
        for i, ch in enumerate(self.channels):
            x = ConvBlock(ch, self.dtype, name=f"enc{i}")(x, deterministic)
            feats.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.channels[-1] * 2, self.dtype,
                      name="bottleneck")(x, deterministic)
        return feats, x


class AttentionUNetDecoder(nn.Module):
    """(reference segmentation.py:158-232)"""
    encoder_channels: Sequence[int] = (64, 128, 256, 512)
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_feats, bottleneck, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        enc_rev = list(reversed(enc_feats))
        enc_ch_rev = list(reversed(list(self.encoder_channels)))
        dec_feats = []
        x = bottleneck
        for i, (enc_ch, dec_ch) in enumerate(zip(enc_ch_rev,
                                                 self.decoder_channels)):
            x = nn.ConvTranspose(dec_ch, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up{i}")(x)
            skip = enc_rev[i]
            if x.shape[1:3] != skip.shape[1:3]:
                x = jax.image.resize(
                    x, (x.shape[0],) + skip.shape[1:3] + (x.shape[-1],),
                    method="linear")
            gated = AttentionGate(max(1, enc_ch // 2), self.dtype,
                                  name=f"attn{i}")(x, skip, deterministic)
            x = jnp.concatenate([x, gated], axis=-1)
            x = ConvBlock(dec_ch, self.dtype, name=f"dec{i}")(x, deterministic)
            dec_feats.append(x)
        mask = nn.Conv(1, (1, 1), dtype=self.dtype, name="final_conv")(x)
        return mask.astype(jnp.float32), dec_feats


class SegmentationBranch(nn.Module):
    """(reference segmentation.py:239-270) — returns
    (mask (B,H,W,1) logits, decoder_features list, bottleneck)."""
    in_channels: int = 3
    encoder_channels: Sequence[int] = (64, 128, 256, 512)
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        enc_feats, bottleneck = UNetEncoder(
            self.encoder_channels, self.dtype, name="encoder")(
                x.astype(self.dtype), deterministic)
        mask, dec_feats = AttentionUNetDecoder(
            self.encoder_channels, self.decoder_channels, self.dtype,
            name="decoder")(enc_feats, bottleneck, deterministic)
        return mask, dec_feats, bottleneck
