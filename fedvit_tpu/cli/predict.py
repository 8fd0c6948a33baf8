"""Inference CLI — batch prediction from trained checkpoints.

    python -m fedvit_tpu.cli.predict --config config.yaml \
        --checkpoint logs/best_fold0 [--checkpoint logs/best_fold1 ...] \
        --images ./new_lesions/ --output predictions.csv [--tta]

The reference has no inference entry at all — its user flow ends at the
training script's test evaluation (train.py:337-366) and an exported
`ensemble_logits.npy`. This CLI closes the deployment loop: it loads one or
more fold checkpoints (written by `cli.train` / `train_fold`), averages
their logits exactly like the reference's fold ensemble (train.py:446-455),
and writes per-image class probabilities.

Inputs are either
  * `--images DIR` — a directory of JPEG/PNG images (no labels, no
    metadata; the metadata branch receives the same neutral defaults the
    training pipeline uses for unknown age/sex/site), or
  * `--isic_dir DIR` — a full ISIC-2019 layout; predicts the test split
    (reference data.py:378-427 semantics, incl. unlabelled placeholder
    handling). If real labels exist, a metrics report is printed.

Evaluation uses the EMA shadow parameters when the checkpoint has them
(the reference always evaluates through EMA, train.py:289-295); pass
`--no-ema` for the raw parameters. `--tta` averages logits over the 8
deterministic reference views (data.py:241-245) before ensembling.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _images_dataframe(images_dir: str):
    """Build a minimal dataframe over a directory of images."""
    import pandas as pd

    exts = {".jpg", ".jpeg", ".png"}
    paths = sorted(p for p in Path(images_dir).iterdir()
                   if p.suffix.lower() in exts)
    if not paths:
        raise SystemExit(f"no images found in {images_dir}")
    return pd.DataFrame({
        "image": [p.stem for p in paths],
        "image_path": [str(p) for p in paths],
        "label": 0,                       # placeholder — no ground truth
    })


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="ISIC 2019 — batch inference (TPU-native)")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--checkpoint", action="append", required=True,
                        metavar="DIR", help="Checkpoint directory written by "
                        "cli.train (repeat for a fold ensemble)")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--images", type=str, help="Directory of images")
    src.add_argument("--isic_dir", type=str, help="ISIC-2019 data directory "
                     "(predicts the test split)")
    parser.add_argument("--output", type=str, default="predictions.csv")
    parser.add_argument("--logits_out", type=str, default=None,
                        help="Also save the ensembled logits as .npy")
    parser.add_argument("--tta", action="store_true",
                        help="8-view test-time augmentation")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--no-ema", dest="ema", action="store_false",
                        help="Use raw (non-EMA) parameters")
    args = parser.parse_args(argv)

    from fedvit_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np

    from fedvit_tpu.core.config import load_config
    from fedvit_tpu.data.constants import IDX_TO_LABEL, VALID_CLASSES
    from fedvit_tpu.data.isic import has_real_test_labels, load_isic_data
    from fedvit_tpu.data.pipeline import HostDataSource, make_device_augment
    from fedvit_tpu.eval.metrics import classification_report
    from fedvit_tpu.train import checkpoint as ckpt
    from fedvit_tpu.train.losses import cross_entropy_loss
    from fedvit_tpu.train.loop import (_evaluate, _softmax, evaluate_with_tta,
                                       init_model_state, optax_identity)
    from fedvit_tpu.train.optim import build_optimizer
    from fedvit_tpu.train.state import TrainState
    from fedvit_tpu.train.step import make_eval_step

    cfg = load_config(args.config)

    if args.isic_dir is not None:
        _, df = load_isic_data(args.isic_dir)
        if len(df) == 0:
            raise SystemExit(f"no test split under {args.isic_dir}")
    else:
        df = _images_dataframe(args.images)
    source = HostDataSource(df, cfg)
    bs = args.batch_size or cfg.training.batch_size
    print(f"[predict] {len(source):,} images, {len(args.checkpoint)} "
          f"checkpoint(s), tta={args.tta}", file=sys.stderr)

    # the checkpoint's opt_state structure was created by build_optimizer;
    # rebuild the same tx so orbax restores into a matching tree
    model, state0 = init_model_state(cfg, optax_identity(), cfg.seed)
    tx, _ = build_optimizer(cfg, state0.params, steps_per_epoch=100)
    template = TrainState.create(model.apply, state0.params,
                                 state0.batch_stats, tx,
                                 jax.random.key(0),
                                 ema_enabled=cfg.training.ema.enabled)

    # eval augmentation fused into the jitted step (one dispatch per batch)
    eval_step = make_eval_step(model.apply, cfg, cross_entropy_loss,
                               augment=make_device_augment(cfg, train=False))

    fold_logits = []
    for path in args.checkpoint:
        if not ckpt.checkpoint_exists(path):
            raise SystemExit(f"no checkpoint at {path}")
        state = ckpt.load_checkpoint(path, template)["state"]
        params = state.eval_params() if args.ema else state.params
        if args.tta:
            _, _, logits = evaluate_with_tta(cfg, model, params,
                                             state.batch_stats, source,
                                             batch_size=bs)
        else:
            res = _evaluate(eval_step, params,
                            state.batch_stats, source, bs,
                            cfg.num_classes)
            logits = res["logits"]
        fold_logits.append(logits)
        print(f"[predict] {path}: done", file=sys.stderr)

    ensembled = np.mean(np.stack(fold_logits), axis=0)
    probs = _softmax(ensembled)
    preds = ensembled.argmax(-1)

    import pandas as pd
    out = pd.DataFrame({"image": df["image"].to_numpy(),
                        "prediction": [IDX_TO_LABEL[int(p)] for p in preds]})
    for i, name in enumerate(VALID_CLASSES):
        out[f"prob_{name}"] = probs[:, i]
    out.to_csv(args.output, index=False)
    print(f"[predict] wrote {args.output}", file=sys.stderr)
    if args.logits_out:
        np.save(args.logits_out, ensembled)
        print(f"[predict] wrote {args.logits_out}", file=sys.stderr)

    if args.isic_dir is not None and has_real_test_labels(df):
        labels = df["label"].to_numpy()
        print(classification_report(labels, preds, VALID_CLASSES))
    return 0


if __name__ == "__main__":
    sys.exit(main())
