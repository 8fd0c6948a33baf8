"""fedvit_tpu — TPU-native federated skin-lesion classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`apurbaaaa/Federated-Vit-Skin-Lesion-Classification` (reference mounted at
/root/reference), designed TPU-first:

  * models/    ViT / SwinV2-class backbones, metadata fusion, seg branch
  * ops/       batched on-device image augmentation, classical-CV segmentation,
               Pallas fused attention
  * train/     losses, AdamW+LLRD, warmup-cosine, EMA, MixUp/CutMix,
               grad-accumulation train step, checkpointing
  * data/      ISIC CSV assembly, stratified (group) K-fold, weighted sampling,
               prefetching input pipeline, synthetic fixtures
  * fed/       federated client partitioning + FedAvg over a TPU mesh
  * parallel/  mesh construction and sharding helpers
  * eval/      metrics (acc / balanced-acc / macro-F1 / AUROC / CM), TTA,
               fold ensembling
  * cli/       train / train-federated / precompute-masks / verify entries
"""

__version__ = "0.1.0"
