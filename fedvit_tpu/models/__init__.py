from fedvit_tpu.models.isic import ISICClassifier, build_model  # noqa: F401
from fedvit_tpu.models.registry import build_backbone, BACKBONE_SPECS  # noqa: F401
