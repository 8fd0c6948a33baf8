"""ISIC-2019 CSV / metadata assembly — host side.

Exact behavioral parity with /root/reference/data.py:343-427:
  * ground-truth parsing: idxmax over one-hot [MEL..UNK] columns, UNK dropped
  * metadata: lesion_id fallback to image id; age fillna(50).clip(0,90)/90;
    sex/site lowercased through the vocabs (site column is either
    `anatom_site_general` or `anatom_site_general_challenge`)
  * image-path construction + missing-file drops with warnings
  * 3-way test handling: GT present / images-only (placeholder dx="MEL",
    label=0) / absent (empty frame)
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import pandas as pd

from fedvit_tpu.data.constants import (LABEL_TO_IDX, NUM_CLASSES, SEX_VOCAB,
                                       SITE_VOCAB, VALID_CLASSES)


def parse_groundtruth_csv(csv_path: Path) -> pd.DataFrame:
    """(reference data.py:343-350)"""
    df = pd.read_csv(csv_path)
    all_cls = ["MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC", "UNK"]
    cols = [c for c in all_cls if c in df.columns]
    df["dx"] = df[cols].idxmax(axis=1)
    df = df[df["dx"].isin(VALID_CLASSES)].copy()
    df["label"] = df["dx"].map(LABEL_TO_IDX)
    return df[["image", "dx", "label"]]


def load_metadata(path: Path) -> pd.DataFrame:
    """(reference data.py:353-375)"""
    df = pd.read_csv(path)
    if "lesion_id" not in df.columns:
        df["lesion_id"] = df["image"]
    age_col = "age_approx" if "age_approx" in df.columns else None
    df["age_norm"] = (df[age_col].fillna(50).clip(0, 90) / 90.0) if age_col else 0.5
    sex_col = "sex" if "sex" in df.columns else None
    df["sex_idx"] = (
        df[sex_col].fillna("unknown").str.lower()
        .map(lambda x: SEX_VOCAB.get(x, SEX_VOCAB["unknown"]))
        if sex_col else SEX_VOCAB["unknown"]
    )
    for col in ("anatom_site_general", "anatom_site_general_challenge"):
        if col in df.columns:
            df["site_idx"] = df[col].fillna("unknown").str.lower().map(
                lambda x: SITE_VOCAB.get(x, SITE_VOCAB["unknown"]))
            break
    else:
        df["site_idx"] = SITE_VOCAB["unknown"]
    return df


def load_isic_data(isic_dir: str, log=print) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Return (full_train_df, test_df) (reference data.py:378-427)."""
    isic = Path(isic_dir)

    train_gt = parse_groundtruth_csv(isic / "ISIC_2019_Training_GroundTruth.csv")
    train_meta = load_metadata(isic / "ISIC_2019_Training_Metadata.csv")
    train_df = train_gt.merge(train_meta, on="image", how="left")
    train_img = isic / "ISIC_2019_Training_Input"
    train_df["image_path"] = train_df["image"].apply(
        lambda x: str(train_img / f"{x}.jpg"))

    missing = ~train_df["image_path"].apply(lambda p: Path(p).exists())
    if missing.any():
        log(f"[Data] WARNING: {missing.sum():,} training images not found "
            f"on disk — dropping.")
        train_df = train_df[~missing].reset_index(drop=True)
    log(f"[Data] Training samples (8-class): {len(train_df):,}")

    test_gt_path = isic / "ISIC_2019_Test_GroundTruth.csv"
    test_meta_path = isic / "ISIC_2019_Test_Metadata.csv"
    test_img = isic / "ISIC_2019_Test_Input"

    if test_gt_path.exists() and test_meta_path.exists():
        test_gt = parse_groundtruth_csv(test_gt_path)
        test_meta = load_metadata(test_meta_path)
        test_df = test_gt.merge(test_meta, on="image", how="left")
        test_df["image_path"] = test_df["image"].apply(
            lambda x: str(test_img / f"{x}.jpg"))
        missing_t = ~test_df["image_path"].apply(lambda p: Path(p).exists())
        if missing_t.any():
            log(f"[Data] WARNING: {missing_t.sum():,} test images not found "
                f"— dropping.")
            test_df = test_df[~missing_t].reset_index(drop=True)
        log(f"[Data] Test samples     (8-class): {len(test_df):,}")
    elif test_meta_path.exists() and test_img.exists():
        log("[Data] No test GT found — building unlabelled test set for "
            "inference only.")
        test_meta = load_metadata(test_meta_path)
        test_df = test_meta[["image"]].copy()
        test_df["dx"] = "MEL"     # placeholder (reference data.py:417)
        test_df["label"] = 0      # placeholder
        test_df = test_df.merge(test_meta, on="image", how="left")
        test_df["image_path"] = test_df["image"].apply(
            lambda x: str(test_img / f"{x}.jpg"))
        test_df = test_df[test_df["image_path"].apply(
            lambda p: Path(p).exists())].reset_index(drop=True)
        log(f"[Data] Unlabelled test images: {len(test_df):,}")
    else:
        log("[Data] No test data found — test evaluation will be skipped.")
        test_df = pd.DataFrame(columns=train_df.columns)

    return train_df, test_df


def has_real_test_labels(test_df: pd.DataFrame) -> bool:
    """Placeholder-label gate (reference train.py:361, data placeholder at
    data.py:417-418)."""
    if len(test_df) == 0:
        return False
    return (test_df["label"].nunique() > 1
            or test_df["dx"].iloc[0] != "MEL")


def print_class_distribution(df: pd.DataFrame, name: str, log=print) -> None:
    """(reference data.py:518-524)"""
    counts = df["label"].value_counts().sort_index()
    total = len(df)
    log(f"\n[{name}] Class Distribution ({total:,} samples):")
    for idx in range(NUM_CLASSES):
        c = int(counts.get(idx, 0))
        log(f"  {idx} {VALID_CLASSES[idx]:5s}: {c:6,} ({100*c/max(total,1):5.2f}%)")
