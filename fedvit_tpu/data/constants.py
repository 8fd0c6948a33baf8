"""ISIC-2019 dataset constants and metadata encoding.

Parity targets: /root/reference/data.py:43-75 (class vocab, label maps,
normalize stats, sex/site vocabs, 13-dim metadata vector).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

VALID_CLASSES: List[str] = ["MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC"]
NUM_CLASSES: int = 8

LABEL_TO_IDX: Dict[str, int] = {n: i for i, n in enumerate(VALID_CLASSES)}
IDX_TO_LABEL: Dict[int, str] = {i: n for i, n in enumerate(VALID_CLASSES)}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

SEX_VOCAB: Dict[str, int] = {"male": 0, "female": 1, "unknown": 2}
NUM_SEX = len(SEX_VOCAB)

SITE_VOCAB: Dict[str, int] = {
    "anterior torso": 0, "upper extremity": 1, "lower extremity": 2,
    "posterior torso": 3, "lateral torso": 4, "head/neck": 5,
    "palms/soles": 6, "oral/genital": 7, "unknown": 8,
}
NUM_SITE = len(SITE_VOCAB)

META_DIM = 1 + NUM_SEX + NUM_SITE  # 13


def encode_metadata_vector(age_norm: float, sex_idx: int, site_idx: int) -> np.ndarray:
    """Return (META_DIM,) float32 = [age, sex_onehot(3), site_onehot(9)].

    Parity: /root/reference/data.py:69-75.
    """
    vec = np.zeros(META_DIM, dtype=np.float32)
    vec[0] = age_norm
    vec[1 + int(sex_idx)] = 1.0
    vec[1 + NUM_SEX + int(site_idx)] = 1.0
    return vec


def encode_metadata_batch(age_norm: np.ndarray, sex_idx: np.ndarray,
                          site_idx: np.ndarray) -> np.ndarray:
    """Vectorized batch encoding → (N, META_DIM) float32."""
    n = len(age_norm)
    out = np.zeros((n, META_DIM), dtype=np.float32)
    out[:, 0] = np.asarray(age_norm, dtype=np.float32)
    out[np.arange(n), 1 + np.asarray(sex_idx, dtype=np.int64)] = 1.0
    out[np.arange(n), 1 + NUM_SEX + np.asarray(site_idx, dtype=np.int64)] = 1.0
    return out
