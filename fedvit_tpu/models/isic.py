"""ISICClassifier — backbone + metadata fusion + classifier (+ optional
segmentation branch with fusion, covering the old-gen HybridViT).

Parity targets:
  * current gen: /root/reference/model.py:67-207 (ISICClassifier)
  * old gen:     /root/reference/model_old.py:119-287 (HybridViT)

Forward contract (matching the reference):
  __call__(images NHWC, metadata=(B,13) or None) →
      {"logits": (B, C), "features": (B, D)[, "seg_mask": (B, H, W, 1)]}
  When metadata is None but the branch is enabled, the embedding is
  zero-filled so the classifier input width stays constant (model.py:199-203).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from fedvit_tpu.core.config import Config
from fedvit_tpu.models.heads import ClassifierHead
from fedvit_tpu.models.metadata import MetadataBranch, MetadataEmbedding
from fedvit_tpu.models.registry import build_backbone


class ISICClassifier(nn.Module):
    backbone_name: str = "vit_base_patch16_224"
    num_classes: int = 8
    image_size: int = 224
    in_channels: int = 3
    pretrained: bool = False
    drop_path_rate: float = 0.1
    pool: str = "cls"
    # metadata
    metadata_enabled: bool = True
    metadata_style: str = "mlp"          # "mlp" | "embedding"
    meta_input_dim: int = 13
    meta_hidden_dim: int = 256
    meta_output_dim: int = 128
    meta_dropout: float = 0.4
    meta_embed_dim: int = 64
    # classifier
    cls_hidden_dim: int = 512
    cls_dropout: float = 0.5
    cls_layer_norm: bool = False
    # old-gen segmentation branch
    seg_enabled: bool = False
    seg_encoder_channels: tuple = (64, 128, 256, 512)
    seg_decoder_channels: tuple = (256, 128, 64, 32)
    fusion_type: str = "attention"
    # old-gen JointLoss mode (loss.seg_weight > 0): the mask rides the
    # batch's 4th canvas channel (so it shares the paired geometric
    # augmentation) but is a TARGET, not an input — the model consumes
    # only the first `in_channels` channels (reference old-gen HybridViT
    # takes the 3-ch image; train_old.py supervises the seg branch)
    mask_as_target: bool = False
    # compute
    compute_dtype: str = "bfloat16"
    attention_impl: str = "auto"
    remat: bool = False

    def setup(self):
        self.backbone, self.backbone_dim = build_backbone(
            self.backbone_name, self.image_size, self.in_channels,
            self.drop_path_rate, self.pool, self.compute_dtype,
            self.attention_impl, self.pretrained, self.remat)

        if self.seg_enabled:
            from fedvit_tpu.models.unet import SegmentationBranch
            from fedvit_tpu.models.fusion import build_fusion_module
            self.seg_branch = SegmentationBranch(
                in_channels=self.in_channels,
                encoder_channels=self.seg_encoder_channels,
                decoder_channels=self.seg_decoder_channels,
                dtype=_dt(self.compute_dtype))
            self.fusion = build_fusion_module(
                self.fusion_type, transformer_dim=self.backbone_dim,
                seg_channels=self.seg_decoder_channels[-1],
                output_dim=self.backbone_dim, dtype=_dt(self.compute_dtype))

        if self.metadata_enabled:
            if self.metadata_style == "mlp":
                self.metadata_branch = MetadataBranch(
                    self.meta_input_dim, self.meta_hidden_dim,
                    self.meta_output_dim, self.meta_dropout,
                    dtype=_dt(self.compute_dtype))
                self._meta_out = self.meta_output_dim
            else:
                self.metadata_branch = MetadataEmbedding(
                    self.meta_embed_dim, dtype=_dt(self.compute_dtype))
                self._meta_out = self.meta_embed_dim

        self.classifier = ClassifierHead(
            self.num_classes, self.cls_hidden_dim, self.cls_dropout,
            self.cls_layer_norm, dtype=_dt(self.compute_dtype))

    def __call__(self, x: jnp.ndarray,
                 metadata: Optional[jnp.ndarray] = None,
                 metadata_raw: Optional[Dict[str, jnp.ndarray]] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """x: (B, H, W, C); metadata: (B, 13) flat vector (current gen) or
        metadata_raw: {"age","sex","site"} (old-gen embedding style)."""
        outputs: Dict[str, jnp.ndarray] = {}
        if self.mask_as_target:
            x = x[..., : self.in_channels]
        features = self.backbone(x, deterministic=deterministic)  # (B, D)
        outputs["features"] = features

        if self.seg_enabled:
            seg_mask, dec_feats, _bottleneck = self.seg_branch(
                x, deterministic=deterministic)
            outputs["seg_mask"] = seg_mask
            features = self.fusion(features, dec_feats[-1],
                                   deterministic=deterministic)

        if self.metadata_enabled:
            if self.metadata_style == "mlp":
                if metadata is not None:
                    meta_emb = self.metadata_branch(metadata, deterministic)
                else:
                    # zero-filled embedding keeps classifier width constant
                    # (reference model.py:199-203)
                    meta_emb = jnp.zeros(
                        (features.shape[0], self._meta_out), features.dtype)
            else:
                if metadata_raw is not None:
                    meta_emb = self.metadata_branch(
                        metadata_raw["age"], metadata_raw["sex"],
                        metadata_raw["site"], deterministic)
                else:
                    meta_emb = jnp.zeros(
                        (features.shape[0], self._meta_out), features.dtype)
            features = jnp.concatenate([features, meta_emb], axis=-1)

        outputs["logits"] = self.classifier(features, deterministic)
        return outputs


def _dt(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


def build_model(cfg: Config) -> ISICClassifier:
    """Factory from typed config (parity: reference model.py:302-324 —
    in_channels = 4 iff data.use_segmentation_mask).

    Old-gen JointLoss mode: `loss.seg_weight > 0` with the seg branch
    enabled keeps the backbone at 3 input channels and treats the batch's
    4th (mask) channel as the BCE-Dice target instead of an input
    (train/step.py adds the seg term; reference train_old.py:392-396)."""
    m = cfg.model
    joint = (m.segmentation.enabled and cfg.loss.seg_weight > 0
             and cfg.data.use_segmentation_mask)
    return ISICClassifier(
        backbone_name=m.backbone,
        num_classes=m.num_classes,
        image_size=m.image_size,
        in_channels=3 if joint else cfg.in_channels,
        mask_as_target=joint,
        # pretrained weights arrive via model.pretrained_path (a converted
        # checkpoint loaded at fold start); only warn when the user asked for
        # pretrained=true without providing one
        pretrained=m.pretrained and not m.pretrained_path,
        drop_path_rate=m.drop_path_rate,
        pool=m.pool,
        metadata_enabled=m.metadata.enabled,
        metadata_style=m.metadata.style,
        meta_input_dim=m.metadata.input_dim,
        meta_hidden_dim=m.metadata.hidden_dim,
        meta_output_dim=m.metadata.output_dim,
        meta_dropout=m.metadata.dropout,
        meta_embed_dim=m.metadata.embed_dim,
        cls_hidden_dim=m.classifier.hidden_dim,
        cls_dropout=m.classifier.dropout,
        cls_layer_norm=m.classifier.layer_norm,
        seg_enabled=m.segmentation.enabled,
        seg_encoder_channels=tuple(m.segmentation.encoder_channels),
        seg_decoder_channels=tuple(m.segmentation.decoder_channels),
        fusion_type=m.segmentation.fusion_type,
        compute_dtype=m.compute_dtype,
        attention_impl=m.attention_impl,
        remat=m.remat,
    )


def count_parameters(params) -> int:
    """Total parameter count (reference model.py:297-299)."""
    import jax
    return sum(int(p.size) for p in jax.tree.leaves(params))
