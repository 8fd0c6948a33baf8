"""Training CLI — parity of the reference entry (train.py:378-474).

    python -m fedvit_tpu.cli.train --config config.yaml [--fold K]
                                   [--log DIR] [--seed N] [--resume]

K-fold stratified CV (group K-fold on lesion_id when available), fold loop,
fold-averaged logit ensemble saved to <log>/ensemble_logits.npy, final
metrics + classification report. Adds --resume (the reference has none).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def setup_logging(log_dir: str, fold: int = -1) -> logging.Logger:
    """(reference train.py:75-88)"""
    os.makedirs(log_dir, exist_ok=True)
    tag = f"fold{fold}" if fold >= 0 else "main"
    logger = logging.getLogger(f"isic_{tag}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        ch = logging.StreamHandler(sys.stdout)
        ch.setFormatter(logging.Formatter("%(asctime)s | %(message)s",
                                          datefmt="%H:%M:%S"))
        logger.addHandler(ch)
        fh = logging.FileHandler(os.path.join(log_dir, f"train_{tag}.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s | %(message)s"))
        logger.addHandler(fh)
    return logger


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="ISIC 2019 — K-Fold CV Training (TPU-native)")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--fold", type=int, default=-1,
                        help="Run a single fold (-1 = all)")
    parser.add_argument("--log", type=str, default="logs")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--resume", action="store_true",
                        help="Resume folds from their latest checkpoint")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of the run into "
                             "DIR (view with TensorBoard/xprof)")
    args = parser.parse_args(argv)

    from fedvit_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    from fedvit_tpu.core.config import load_config
    from fedvit_tpu.data.isic import (has_real_test_labels, load_isic_data,
                                      print_class_distribution)
    from fedvit_tpu.data.pipeline import HostDataSource
    from fedvit_tpu.data.splits import make_cv_splits
    from fedvit_tpu.eval.metrics import classification_report
    from fedvit_tpu.train.loop import (aggregate_fold_metrics, ensemble_folds,
                                       train_fold)

    cfg = load_config(args.config).replace(seed=args.seed)
    logger = setup_logging(args.log)
    log = logger.info

    t = cfg.training
    n_folds = t.cv.n_splits
    log("=" * 60)
    log(f"  ISIC 2019 Classifier — {n_folds}-Fold CV (TPU-native)")
    log("=" * 60)

    train_full_df, test_df = load_isic_data(cfg.data.isic_dir, log=log)
    print_class_distribution(train_full_df, "Full Train", log=log)
    if len(test_df) > 0:
        print_class_distribution(test_df, "Test", log=log)

    eff_bs = t.batch_size * t.gradient_accumulation_steps
    log(f"  [Config] physical_bs={t.batch_size}, "
        f"accum={t.gradient_accumulation_steps}, effective_bs={eff_bs}")

    # auto batch-size probe (reference train.py:411-418: probe, then
    # override training.batch_size with the result)
    if t.auto_batch_size:
        import dataclasses
        from fedvit_tpu.train.probe import auto_batch_size
        bs = auto_batch_size(cfg, log=log)
        cfg = cfg.replace(training=dataclasses.replace(cfg.training,
                                                       batch_size=bs))
        t = cfg.training

    labels = train_full_df["label"].values
    groups = (train_full_df["lesion_id"].values
              if "lesion_id" in train_full_df.columns
              and train_full_df["lesion_id"].nunique() > 1 else None)
    splits = make_cv_splits(labels, groups, n_folds, args.seed)
    log(f"[Split] {'StratifiedGroupKFold (on lesion_id)' if groups is not None else 'StratifiedKFold'}")

    test_source = (HostDataSource(test_df, cfg) if len(test_df) > 0 else None)

    fold_list = list(range(n_folds)) if args.fold < 0 else [args.fold]
    fold_results = []
    import contextlib
    from fedvit_tpu.utils.profiling import trace
    profile_cm = trace(args.profile) if args.profile else contextlib.nullcontext()
    with profile_cm:
        for f in fold_list:
            trn_idx, val_idx = splits[f]
            trn_src = HostDataSource(train_full_df.iloc[trn_idx], cfg)
            val_src = HostDataSource(train_full_df.iloc[val_idx], cfg)
            fold_log = setup_logging(os.path.join(args.log, f"fold{f}"), fold=f)
            fold_results.append(train_fold(
                cfg, f, trn_src, val_src, test_source,
                workdir=os.path.join(args.log, f"fold{f}"),
                log=fold_log.info, resume=args.resume))
    if args.profile:
        log(f"  Profiler trace written → {args.profile}")

    has_gt = has_real_test_labels(test_df)
    if test_source is not None and has_gt:
        aggregate_fold_metrics(fold_results, test_df["label"].values,
                               cfg.num_classes, log)
    ens = (ensemble_folds(fold_results, test_df["label"].values,
                          cfg.num_classes, log, compute=has_gt)
           if test_source is not None else {})
    if ens:
        avg = ens["ensemble_logits"]
        os.makedirs(args.log, exist_ok=True)
        np.save(os.path.join(args.log, "ensemble_logits.npy"), avg)
        log(f"  Ensemble logits saved → {args.log}/ensemble_logits.npy")
        # metrics only with real ground truth (placeholder gate, train.py:459)
        if has_gt:
            preds = avg.argmax(axis=1)
            labels_t = test_df["label"].values
            m = ens["ensemble_metrics"]
            log("\n" + classification_report(labels_t, preds,
                                             list(cfg.class_names)))
            log(f"Confusion Matrix:\n{m['confusion_matrix']}")
    log("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
