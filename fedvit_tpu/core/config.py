"""Typed, validated configuration — the single source of defaults.

The reference spreads defaults across ~60 ``cfg.get(key, default)`` call sites
(e.g. /root/reference/train.py:109-123, data.py:440-451, model.py:302-324).
Here every knob lives in one dataclass tree; ``load_config`` accepts the
reference's YAML schema verbatim (/root/reference/config.yaml:1-147) plus the
old-generation keys (/root/reference/config_old.yaml) and our federated
extensions, so a user of the reference can bring their config file unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


# ---------------------------------------------------------------------------
# Leaf sections
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DataConfig:
    isic_dir: str = "./ISIC"
    use_segmentation_mask: bool = True
    segmentation_mask_dir: str = "./masks"
    # our extension: generate masks on-device instead of reading PNGs
    on_device_masks: bool = False
    # decoded-canvas RAM cache budget in GiB; 0 = unbounded (fits ISIC-2019
    # at 224-canvas; a 384-canvas needs ~19 GB → set a budget and the cache
    # becomes LRU)
    cache_gb: float = 0.0
    # host batches decoded ahead of device compute (epoch_batches)
    prefetch_batches: int = 2
    # keep the decoded uint8 canvases resident in HBM and gather batches on
    # device (data/pipeline.DeviceDataSource) when the dataset fits this
    # budget; 0 streams every batch from the host instead. Removes ALL
    # per-step H2D traffic — essential on tunneled devices, still the right
    # default on real TPU VMs. (ISIC-2019 at the 272 canvas is ~7.2 GB.)
    device_resident_mb: int = 8192


@dataclass(frozen=True)
class MetadataConfig:
    # MetadataBranch MLP (reference model.py:27-60)
    enabled: bool = True
    input_dim: int = 13       # age(1) + sex one-hot(3) + site one-hot(9)
    hidden_dim: int = 256
    output_dim: int = 128
    dropout: float = 0.4
    # old-gen learned-embedding variant (reference model_old.py:28-112)
    style: str = "mlp"        # "mlp" | "embedding"
    embed_dim: int = 64


@dataclass(frozen=True)
class ClassifierConfig:
    hidden_dim: int = 512
    dropout: float = 0.5
    # old-gen head uses LayerNorm after GELU (model_old.py:215-221)
    layer_norm: bool = False


@dataclass(frozen=True)
class SegBranchConfig:
    """Old-gen attention U-Net segmentation branch (segmentation.py:239-270)."""
    enabled: bool = False
    encoder_channels: Tuple[int, ...] = (64, 128, 256, 512)
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32)
    fusion_type: str = "attention"  # attention | concat | cross_attention


@dataclass(frozen=True)
class ModelConfig:
    backbone: str = "vit_base_patch16_224"
    image_size: int = 224
    num_classes: int = 8
    pretrained: bool = False
    # converted pretrained checkpoint (written by cli.import_weights from a
    # torch/timm .pt/.bin/.safetensors file) to start every fold from —
    # the deployable form of the reference's `pretrained: true` production
    # path (/root/reference/config.yaml:31, model.py:112-166)
    pretrained_path: str = ""
    drop_path_rate: float = 0.1
    pool: str = "cls"              # "cls" | "mean" (token pooling)
    metadata: MetadataConfig = field(default_factory=MetadataConfig)
    classifier: ClassifierConfig = field(default_factory=ClassifierConfig)
    segmentation: SegBranchConfig = field(default_factory=SegBranchConfig)
    # compute dtype for matmuls/activations; params stay fp32
    compute_dtype: str = "bfloat16"
    attention_impl: str = "auto"   # "auto" | "pallas" | "xla" | "mega" | "packed"
                                   # (mega: ViT QKV projection fused into
                                   # the attention kernel)
    remat: bool = False            # rematerialize transformer blocks


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-5
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # dtype of Adam's first moment (HBM traffic / capacity trade; the second
    # moment stays fp32 for range). "float32" matches torch AdamW bit
    # behavior (the fp32 parity harness relies on it); perf configs use
    # "bfloat16".
    mu_dtype: str = "float32"


@dataclass(frozen=True)
class SchedulerConfig:
    warmup_epochs: int = 5
    min_lr: float = 1e-6


@dataclass(frozen=True)
class LLRDConfig:
    enabled: bool = True
    decay_rate: float = 0.75
    head_lr_mult: float = 10.0     # reference model.py:267 (head at 10x base)


@dataclass(frozen=True)
class EMAConfig:
    enabled: bool = True
    decay: float = 0.9995


@dataclass(frozen=True)
class EarlyStoppingConfig:
    patience: int = 15
    metric: str = "balanced_accuracy"


@dataclass(frozen=True)
class TTAConfig:
    enabled: bool = True
    n: int = 8
    # non-empty → old-gen named-view TTA (corner crops etc.,
    # reference data_old.py:208-304) instead of the 8 deterministic views;
    # names: original, hflip, vflip, crop_tl, crop_br, crop_center
    views: Tuple[str, ...] = ()


@dataclass(frozen=True)
class CVConfig:
    enabled: bool = True
    n_splits: int = 5


@dataclass(frozen=True)
class TwoStageConfig:
    """Old-gen two-stage schedule (train_old.py:433-596)."""
    enabled: bool = False
    stage1_epochs: int = 5
    stage1_lr: float = 1e-3


@dataclass(frozen=True)
class TrainingConfig:
    epochs: int = 80
    batch_size: int = 4
    gradient_accumulation_steps: int = 4
    auto_batch_size: bool = False
    # shard the macro batch over a "data" mesh of all visible devices in
    # train_fold (grads pmean'd by XLA SPMD); single-device runs ignore it
    data_parallel: bool = False
    num_workers: int = 8           # host-side prefetch threads
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    llrd: LLRDConfig = field(default_factory=LLRDConfig)
    grad_clip: float = 1.0
    use_amp: bool = True           # bfloat16 compute on TPU
    use_weighted_sampler: bool = True
    cv: CVConfig = field(default_factory=CVConfig)
    ema: EMAConfig = field(default_factory=EMAConfig)
    early_stopping: EarlyStoppingConfig = field(default_factory=EarlyStoppingConfig)
    tta: TTAConfig = field(default_factory=TTAConfig)
    two_stage: TwoStageConfig = field(default_factory=TwoStageConfig)


@dataclass(frozen=True)
class RandomResizedCropConfig:
    scale: Tuple[float, float] = (0.7, 1.0)
    ratio: Tuple[float, float] = (0.9, 1.1)


@dataclass(frozen=True)
class ColorJitterConfig:
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.0


@dataclass(frozen=True)
class RandAugmentConfig:
    enabled: bool = True
    n: int = 3
    m: int = 12


@dataclass(frozen=True)
class TrainAugConfig:
    random_resized_crop: RandomResizedCropConfig = field(default_factory=RandomResizedCropConfig)
    horizontal_flip: bool = True
    vertical_flip: bool = True
    rotation: float = 30.0
    color_jitter: ColorJitterConfig = field(default_factory=ColorJitterConfig)
    randaugment: RandAugmentConfig = field(default_factory=RandAugmentConfig)


@dataclass(frozen=True)
class MixupConfig:
    enabled: bool = True
    alpha: float = 0.4


@dataclass(frozen=True)
class CutmixConfig:
    enabled: bool = True
    alpha: float = 1.0
    prob: float = 0.7


@dataclass(frozen=True)
class AugmentationConfig:
    train: TrainAugConfig = field(default_factory=TrainAugConfig)
    mixup: MixupConfig = field(default_factory=MixupConfig)
    cutmix: CutmixConfig = field(default_factory=CutmixConfig)


@dataclass(frozen=True)
class AsymmetricLossConfig:
    gamma_neg: float = 4.0
    gamma_pos: float = 1.0
    clip: float = 0.05


@dataclass(frozen=True)
class LossConfig:
    type: str = "asymmetric"       # asymmetric | focal | ce
    class_weights: bool = False
    label_smoothing: float = 0.0
    asymmetric: AsymmetricLossConfig = field(default_factory=AsymmetricLossConfig)
    focal_gamma: float = 2.0
    # old-gen joint seg+cls loss (train_old.py:392-396)
    seg_weight: float = 0.0        # >0 enables JointLoss with BCE-Dice seg term


@dataclass(frozen=True)
class CheckpointConfig:
    dir: str = "./checkpoints"
    keep: int = 1
    resume: bool = False


@dataclass(frozen=True)
class FederatedConfig:
    """Our federated extension — the repo-name capability the reference never
    implemented (see SURVEY.md §0/§2.3)."""
    enabled: bool = False
    num_clients: int = 4
    clients_per_round: int = 0      # 0 = all clients (full participation)
    rounds: int = 10
    local_epochs: int = 1
    local_steps: int = 0            # >0 overrides local_epochs with a fixed count
    partition: str = "dirichlet"    # dirichlet | iid | shards
    dirichlet_alpha: float = 0.5
    server_lr: float = 1.0          # FedAvg step size on aggregated delta
    mesh_axis: str = "client"
    # apply the train-time device augmentation inside each local step
    # (False still applies the eval transform = resize/crop + normalization,
    # so clients NEVER train on unnormalized pixels)
    augment: bool = True
    # keep the (uint8-canvas) training set resident in HBM and gather each
    # round's client batches ON DEVICE from tiny host-sampled index arrays.
    # The host-side assemble (numpy fancy-index + stack + H2D of ~100s of MB
    # per round) otherwise bounds the round wall-time on slow hosts. Datasets
    # above device_resident_mb fall back to the host assemble path.
    device_resident_data: bool = True
    device_resident_mb: int = 2048


@dataclass(frozen=True)
class Config:
    seed: int = 42
    device: str = "auto"
    data: DataConfig = field(default_factory=DataConfig)
    class_names: Tuple[str, ...] = ("MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC")
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    federated: FederatedConfig = field(default_factory=FederatedConfig)

    @property
    def num_classes(self) -> int:
        return self.model.num_classes

    @property
    def in_channels(self) -> int:
        # 4 iff segmentation mask is fed as the 4th channel (model.py:308)
        return 4 if self.data.use_segmentation_mask else 3

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# YAML loading — accepts the reference schema
# ---------------------------------------------------------------------------

def _build(dc_type, raw: Any):
    """Recursively build a dataclass from a raw dict, ignoring unknown keys."""
    if raw is None:
        return dc_type()
    if not dataclasses.is_dataclass(dc_type):
        return raw
    kwargs: Dict[str, Any] = {}
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    for name, f in fields.items():
        if name not in raw:
            continue
        val = raw[name]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type.endswith("Config")
        ):
            ftype = f.type if dataclasses.is_dataclass(f.type) else _CONFIG_TYPES[f.type]
            kwargs[name] = _build(ftype, val)
        elif isinstance(val, list):
            kwargs[name] = tuple(val)
        else:
            kwargs[name] = val
    return dc_type(**kwargs)


_CONFIG_TYPES = {c.__name__: c for c in (
    DataConfig, MetadataConfig, ClassifierConfig, SegBranchConfig, ModelConfig,
    OptimizerConfig, SchedulerConfig, LLRDConfig, EMAConfig, EarlyStoppingConfig,
    TTAConfig, CVConfig, TwoStageConfig, TrainingConfig, RandomResizedCropConfig,
    ColorJitterConfig, RandAugmentConfig, TrainAugConfig, MixupConfig,
    CutmixConfig, AugmentationConfig, AsymmetricLossConfig, LossConfig,
    CheckpointConfig, FederatedConfig, Config,
)}


def from_dict(raw: Dict[str, Any]) -> Config:
    """Build a Config from a raw (reference-schema) dict."""
    raw = dict(raw or {})

    # --- adapt reference-schema quirks to our tree -------------------------
    # classes: {names, num_classes} → class_names + model.num_classes
    classes = raw.pop("classes", None)
    model_raw = dict(raw.get("model") or {})
    if classes:
        if "names" in classes:
            raw["class_names"] = classes["names"]
        if "num_classes" in classes and "num_classes" not in model_raw:
            model_raw["num_classes"] = classes["num_classes"]

    # old-gen model block: {model: {segmentation: {...}, fusion: {...}}}
    seg_raw = model_raw.get("segmentation")
    if isinstance(seg_raw, dict) and "fusion_type" not in seg_raw:
        fusion = model_raw.get("fusion") or {}
        if "type" in fusion:
            seg_raw = dict(seg_raw)
            seg_raw["fusion_type"] = fusion["type"]
            model_raw["segmentation"] = seg_raw
    raw["model"] = model_raw

    cfg = _build(Config, raw)
    validate(cfg)
    return cfg


def validate(cfg: Config) -> None:
    assert cfg.model.num_classes == len(cfg.class_names), (
        f"num_classes={cfg.model.num_classes} != len(class_names)={len(cfg.class_names)}")
    assert cfg.model.metadata.input_dim == 13, "metadata vector is [age, sex(3), site(9)]"
    assert cfg.training.batch_size >= 1
    assert cfg.training.gradient_accumulation_steps >= 1
    assert 0.0 <= cfg.training.llrd.decay_rate <= 1.0
    assert cfg.model.pool in ("cls", "mean")
    assert cfg.model.segmentation.fusion_type in ("attention", "concat", "cross_attention")
    assert cfg.federated.partition in ("dirichlet", "iid", "shards")
    if cfg.federated.enabled:
        assert cfg.federated.clients_per_round <= cfg.federated.num_clients


def load_config(path: str) -> Config:
    """Load a YAML config (reference schema accepted) into a typed Config."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return from_dict(raw)


def to_dict(cfg: Config) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
