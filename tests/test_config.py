"""Config loading — reference YAML schema accepted verbatim."""

import textwrap

from fedvit_tpu.core.config import Config, from_dict, load_config

REFERENCE_YAML = textwrap.dedent("""
seed: 42
device: "auto"
data:
  isic_dir: "./ISIC"
  use_segmentation_mask: true
  segmentation_mask_dir: "./masks"
classes:
  names: ["MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC"]
  num_classes: 8
model:
  backbone: "swinv2_large_window12to24_192to384.ms_in22k_ft_in1k"
  image_size: 384
  num_classes: 8
  pretrained: true
  drop_path_rate: 0.4
  metadata:
    enabled: true
    input_dim: 13
    hidden_dim: 256
    output_dim: 128
    dropout: 0.4
  classifier:
    hidden_dim: 512
    dropout: 0.5
training:
  epochs: 80
  batch_size: 4
  gradient_accumulation_steps: 4
  auto_batch_size: false
  num_workers: 8
  pin_memory: true
  optimizer:
    lr: 0.0001
    weight_decay: 0.00001
  scheduler:
    warmup_epochs: 5
    min_lr: 0.000001
  llrd:
    enabled: true
    decay_rate: 0.75
  grad_clip: 1.0
  use_amp: true
  use_weighted_sampler: true
  cv:
    enabled: true
    n_splits: 5
  ema:
    enabled: true
    decay: 0.9995
  early_stopping:
    patience: 15
    metric: "balanced_accuracy"
  tta:
    enabled: true
    n: 8
augmentation:
  train:
    random_resized_crop:
      scale: [0.7, 1.0]
      ratio: [0.9, 1.1]
    horizontal_flip: true
    vertical_flip: true
    rotation: 30
    color_jitter:
      brightness: 0.2
      contrast: 0.2
      saturation: 0.2
      hue: 0.0
    randaugment:
      enabled: true
      n: 3
      m: 12
  mixup:
    enabled: true
    alpha: 0.4
  cutmix:
    enabled: true
    alpha: 1.0
    prob: 0.7
loss:
  type: "asymmetric"
  class_weights: false
  asymmetric:
    gamma_neg: 4
    gamma_pos: 1
    clip: 0.05
checkpoint:
  dir: "./checkpoints"
""")


def test_reference_yaml_roundtrip(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = load_config(str(p))
    assert cfg.seed == 42
    assert cfg.model.image_size == 384
    assert cfg.model.num_classes == 8
    assert cfg.class_names == ("MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC")
    assert cfg.model.metadata.hidden_dim == 256
    assert cfg.model.classifier.dropout == 0.5
    assert cfg.training.epochs == 80
    assert cfg.training.gradient_accumulation_steps == 4
    assert cfg.training.optimizer.lr == 1e-4
    assert cfg.training.llrd.decay_rate == 0.75
    assert cfg.training.ema.decay == 0.9995
    assert cfg.training.early_stopping.metric == "balanced_accuracy"
    assert cfg.augmentation.train.random_resized_crop.scale == (0.7, 1.0)
    assert cfg.augmentation.cutmix.prob == 0.7
    assert cfg.loss.asymmetric.gamma_neg == 4
    assert cfg.in_channels == 4
    assert cfg.checkpoint.dir == "./checkpoints"


def test_defaults_single_source():
    cfg = from_dict({})
    assert cfg.model.num_classes == 8
    assert cfg.training.scheduler.warmup_epochs == 5
    assert cfg.loss.type == "asymmetric"
    assert cfg.in_channels == 4  # use_segmentation_mask defaults true


def test_unknown_keys_ignored():
    cfg = from_dict({"model": {"backbone": "vit_base_patch16_224",
                               "some_future_key": 1}})
    assert cfg.model.backbone == "vit_base_patch16_224"


def test_federated_extension():
    cfg = from_dict({"federated": {"enabled": True, "num_clients": 8,
                                   "dirichlet_alpha": 0.1}})
    assert cfg.federated.enabled and cfg.federated.num_clients == 8


def test_replace():
    cfg = Config()
    cfg2 = cfg.replace(seed=7)
    assert cfg2.seed == 7 and cfg.seed == 42
