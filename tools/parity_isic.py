#!/usr/bin/env python
"""North-star parity run: the REAL reference pipeline vs fedvit_tpu, side by
side on ISIC data, per-round AUROC deltas vs the ±0.005 bar (BASELINE.md).

What it does
------------
1. Loads the data with our exact reference-semantics CSV loader
   (fedvit_tpu/data/isic.py; reference data.py:378-427) given --isic_dir,
   or fabricates a small on-disk JPEG fixture with --synthetic so the whole
   tool runs end-to-end on a host WITHOUT the dataset.
2. Decodes + deterministically preprocesses every image ONCE at fp32 (the
   eval transform: resize -> center crop -> ImageNet normalize), so BOTH
   frameworks consume byte-identical inputs. Cross-framework augmentation
   RNG can never match, so what this tool measures is model + optimizer +
   loss + metric parity — the part where a divergence is a bug. Transform
   parity is covered separately by the PIL/cv2 oracle tests
   (tests/test_image_ops.py).
3. Builds the REAL reference model / LLRD optimizer / loss — the modules in
   /root/reference imported via the tests/reference_oracle shims, or real
   timm when it is importable (a networked host) — and our model carrying
   IDENTICAL weights (models/import_weights.import_torch_isic). With
   --weights, both sides start from the same torch .pt/.safetensors file.
4. Trains both for --rounds epochs on the SAME batch sequence: reference
   train.train_one_epoch (train.py:95-168, AdamW + LLRD + clip + per-epoch
   WarmupCosine) vs our jitted train_step, validating after each round.
5. Prints the per-round table (loss / accuracy / AUROC, each side), checks
   every round's |AUROC delta| against --bar (default 0.005), emits one
   JSON summary line, and exits non-zero on any violation.

Invocation on a host with the real dataset (and optionally real timm +
downloaded weights):

    python tools/parity_isic.py --isic_dir /data/isic2019 \
        --backbone vit_base_patch16_224 --image_size 224 \
        --weights vit_b16_in21k.safetensors --rounds 3 \
        --n_train 2048 --n_val 1024 --loss asymmetric

Runnable-here smoke (synthetic fixture, tiny ViT, CPU):

    python tools/parity_isic.py --synthetic --rounds 2
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("TQDM_DISABLE", "1")   # reference's epoch bar

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--isic_dir", type=str,
                     help="ISIC-2019 directory (GroundTruth/Metadata CSVs + "
                          "ISIC_2019_Training_Input)")
    src.add_argument("--synthetic", action="store_true",
                     help="fabricate an on-disk JPEG fixture instead")
    p.add_argument("--rounds", type=int, default=2,
                   help="training rounds (epochs); AUROC checked after each")
    p.add_argument("--backbone", type=str, default=None,
                   help="timm-style name (default: vit_tiny_patch16_<size>)")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_train", type=int, default=192,
                   help="training subsample size (0 = all)")
    p.add_argument("--n_val", type=int, default=96,
                   help="validation subsample size")
    p.add_argument("--weights", type=str, default=None,
                   help="torch .pt/.bin/.safetensors both sides start from "
                        "(a full reference ISICClassifier state dict)")
    p.add_argument("--loss", choices=["ce", "asymmetric"], default="ce")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--bar", type=float, default=0.005,
                   help="per-round |AUROC delta| acceptance bar")
    p.add_argument("--metadata", action=argparse.BooleanOptionalAction,
                   default=True, help="metadata fusion branch on both sides")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                   help="cpu (default; torch side is CPU-only here, fp32 "
                        "reduction order matches best) or the real chip")
    return p.parse_args(argv)


def _backbone_depth(name: str):
    """Block count (ViT) or per-stage depths tuple (Swin) for the weight
    importer (models/import_weights.import_torch_isic)."""
    m = re.match(r"^(?:vit|deit|eva02?)_(tiny|small|base|large|huge)_patch",
                 name)
    if m:
        from fedvit_tpu.models.vit import VIT_CONFIGS
        return VIT_CONFIGS[m.group(1)]["depth"]
    from fedvit_tpu.models.registry import BACKBONE_SPECS
    spec = BACKBONE_SPECS.get(name)
    if spec is None:
        from fedvit_tpu.models.swin import SWIN_CONFIGS
        sm = re.match(r"^swin(?:v2)?_(tiny|small|base|large)", name)
        if not sm:
            raise SystemExit(f"cannot infer depth for backbone {name}")
        spec = SWIN_CONFIGS[sm.group(1)]
    return tuple(spec["depths"])


def _our_cfg(args, backbone: str, steps_per_epoch: int):
    from fedvit_tpu.core.config import from_dict
    return from_dict({
        "model": {"backbone": backbone, "image_size": args.image_size,
                  "compute_dtype": "float32", "drop_path_rate": 0.0,
                  "pool": "cls",
                  "metadata": {"enabled": args.metadata, "dropout": 0.0},
                  "classifier": {"dropout": 0.0}},
        "data": {"use_segmentation_mask": False},
        "training": {"epochs": args.rounds, "batch_size": args.batch_size,
                     "gradient_accumulation_steps": 1,
                     "optimizer": {"lr": args.lr,
                                   "weight_decay": args.weight_decay},
                     "scheduler": {"warmup_epochs": args.warmup_epochs,
                                   "min_lr": 1e-6},
                     "llrd": {"enabled": True, "decay_rate": 0.75,
                              "head_lr_mult": 10.0},
                     "ema": {"enabled": False},
                     "grad_clip": 1.0},
        "augmentation": {"mixup": {"enabled": False},
                         "cutmix": {"enabled": False}},
        "loss": {"type": args.loss},
    })


def _load_dataframe(args, workdir):
    """(df, n_classes) — real ISIC train split or the synthetic fixture."""
    if args.isic_dir:
        from fedvit_tpu.data.isic import load_isic_data
        df, _ = load_isic_data(args.isic_dir)
        return df
    sys.path.insert(0, str(REPO))
    from bench import _write_synthetic_isic
    n = max(args.n_train + args.n_val,
            2 * args.batch_size) if args.n_train else 256
    df, _ = _write_synthetic_isic(Path(workdir), n, src_size=160,
                                  with_masks=False)
    return df


def _preprocess_once(df, args, cfg):
    """Decode + eval-transform everything to fp32 arrays both sides share."""
    import jax
    import jax.numpy as jnp

    from fedvit_tpu.data.pipeline import HostDataSource, make_device_augment

    source = HostDataSource(df, cfg)
    augment = jax.jit(make_device_augment(cfg, train=False))
    xs, ys, mds = [], [], []
    for batch in source.sequential_batches(64):
        jb = augment({k: jnp.asarray(v) for k, v in batch.items()},
                     jax.random.key(0))
        xs.append(np.asarray(jb["image"], np.float32))
        ys.append(np.asarray(batch["label"], np.int64))
        mds.append(np.asarray(jb["metadata"], np.float32))
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(mds)


def _torch_items(x, y, md, use_meta):
    import torch
    items = []
    for i in range(len(y)):
        it = {"image": torch.from_numpy(x[i]).permute(2, 0, 1),
              "label": int(y[i])}
        if use_meta:
            it["metadata"] = torch.from_numpy(md[i])
        items.append(it)
    return items


def _torch_val_outputs(tm, x, md, use_meta, bs):
    import torch
    logits = []
    with torch.no_grad():
        for s in range(0, len(x), bs):
            out = tm(torch.from_numpy(x[s:s + bs]).permute(0, 3, 1, 2),
                     metadata=(torch.from_numpy(md[s:s + bs])
                               if use_meta else None))
            logits.append(out["logits"].float().numpy())
    return np.concatenate(logits)


def _auroc(labels, logits):
    """Macro one-vs-rest AUROC via our midrank implementation (oracle-tested
    vs sklearn in tests/test_metrics.py) — one metric code path for both
    sides, so the delta isolates the MODELS."""
    from fedvit_tpu.eval.metrics import auroc_ovr_macro
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return float(auroc_ovr_macro(np.asarray(labels), p))


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # bit-for-bit fp32 matmuls on TPU (conftest does the same for tests)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch
    import torch.nn as nn

    torch.manual_seed(args.seed)

    try:                      # real timm (networked host) wins over the shim
        import timm  # noqa: F401
    except ImportError:
        pass
    from reference_oracle import load_reference
    ref = load_reference()

    backbone = args.backbone or f"vit_tiny_patch16_{args.image_size}"
    log = logging.getLogger("parity")
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    with tempfile.TemporaryDirectory(prefix="parity_isic_") as workdir:
        df = _load_dataframe(args, workdir)
        rng = np.random.default_rng(args.seed)
        order = rng.permutation(len(df))
        n_val = min(args.n_val, len(df) // 3)
        val_idx = order[:n_val]
        train_idx = order[n_val:]
        if args.n_train:
            train_idx = train_idx[:args.n_train]
        print(f"[parity] {len(train_idx)} train / {n_val} val images, "
              f"backbone={backbone}, loss={args.loss}, "
              f"rounds={args.rounds}", file=sys.stderr)

        cfg = _our_cfg(args, backbone,
                       steps_per_epoch=max(1, len(train_idx)
                                           // args.batch_size))
        # decode ONLY the rows this run uses (real ISIC is 25k images)
        used = np.concatenate([val_idx, train_idx])
        t0 = time.time()
        x, y, md = _preprocess_once(df.iloc[used].reset_index(drop=True),
                                    args, cfg)
        print(f"[parity] decoded+preprocessed {len(y)} images in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

    xv, yv, mv = x[:n_val], y[:n_val], md[:n_val]
    xt, yt, mt = x[n_val:], y[n_val:], md[n_val:]

    # ---- reference side: the real modules --------------------------------
    tm = ref.model.ISICClassifier(
        backbone_name=backbone, num_classes=8, image_size=args.image_size,
        in_channels=3, pretrained=False, drop_path_rate=0.0,
        metadata_enabled=args.metadata, meta_dropout=0.0, cls_dropout=0.0)
    tm = tm.float().eval()
    if args.weights:
        from fedvit_tpu.models.import_weights import load_torch_file
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in load_torch_file(args.weights).items()}
        tm.load_state_dict(sd, strict=True)
        print(f"[parity] both sides start from {args.weights}",
              file=sys.stderr)
    groups = ref.model.get_layerwise_lr_groups(
        tm, base_lr=args.lr, decay_rate=0.75,
        weight_decay=args.weight_decay)
    opt = torch.optim.AdamW(groups, weight_decay=args.weight_decay)
    sched = ref.utils.WarmupCosineScheduler(
        opt, warmup_epochs=args.warmup_epochs, total_epochs=args.rounds,
        min_lr=1e-6)
    criterion = (ref.losses.build_loss({}) if args.loss == "asymmetric"
                 else nn.CrossEntropyLoss())
    scaler = torch.amp.GradScaler("cpu", enabled=False)
    ref_cfg = {"training": {"use_amp": False, "grad_clip": 1.0,
                            "gradient_accumulation_steps": 1},
               "model": {"metadata": {"enabled": args.metadata}},
               "augmentation": {"mixup": {"alpha": 0.0},
                                "cutmix": {"prob": 0.0}}}

    # ---- our side: identical weights via the importer --------------------
    from fedvit_tpu.models import build_model
    from fedvit_tpu.models.import_weights import import_torch_isic
    from fedvit_tpu.train.losses import build_loss
    from fedvit_tpu.train.loop import _evaluate
    from fedvit_tpu.train.optim import build_optimizer
    from fedvit_tpu.train.state import TrainState
    from fedvit_tpu.train.step import make_eval_step, make_train_step

    jm = build_model(cfg)
    jrng = jax.random.key(args.seed)
    variables = jm.init(
        {"params": jrng, "dropout": jrng},
        jnp.zeros((2, args.image_size, args.image_size, 3), jnp.float32),
        jnp.zeros((2, 13), jnp.float32) if args.metadata else None)
    variables = import_torch_isic(tm.state_dict(), variables,
                                  depth=_backbone_depth(backbone))

    # sanity: identical weights -> identical logits before any training
    pre_ref = _torch_val_outputs(tm, xv[:8], mv[:8], args.metadata, 8)
    pre_ours = np.asarray(jm.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(xv[:8]),
        jnp.asarray(mv[:8]) if args.metadata else None,
        deterministic=True)["logits"])
    pre_gap = float(np.max(np.abs(pre_ref - pre_ours)))
    print(f"[parity] pre-training logit gap (same weights): {pre_gap:.2e}",
          file=sys.stderr)
    if pre_gap > 1e-3:
        print("[parity] FATAL: weight import does not reproduce the "
              "reference model", file=sys.stderr)
        return 2

    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(cfg, variables["params"],
                            steps_per_epoch=max(1, len(yt)
                                                // args.batch_size))
    state = TrainState.create(
        jm.apply, jax.tree.map(jnp.array, variables["params"]),
        jax.tree.map(jnp.array, variables["batch_stats"]), tx,
        jax.random.key(args.seed), ema_enabled=False)
    train_step = make_train_step(cfg, loss_fn, donate=False)
    eval_step = make_eval_step(jm.apply, cfg, loss_fn)

    class _ValSource:
        def __len__(self):
            return len(yv)

        def sequential_batches(self, bs):
            for s in range(0, len(yv), bs):
                b = {"image": xv[s:s + bs], "label": yv[s:s + bs].astype(
                    np.int32)}
                if args.metadata:
                    b["metadata"] = mv[s:s + bs]
                yield b

    bs = args.batch_size
    use_meta = args.metadata
    rows, worst = [], 0.0
    for rnd in range(1, args.rounds + 1):
        perm = np.random.default_rng(args.seed + 1000 + rnd).permutation(
            len(yt))
        n_full = (len(yt) // bs) * bs
        perm = perm[:n_full]

        # reference epoch (the REAL train_one_epoch)
        items = _torch_items(xt[perm], yt[perm], mt[perm], use_meta)
        loader = torch.utils.data.DataLoader(items, batch_size=bs,
                                             shuffle=False)
        tm.train()
        ref_loss = ref.train.train_one_epoch(
            tm, loader, criterion, opt, None, scaler, None,
            torch.device("cpu"), ref_cfg, rnd, log)
        sched.step()                        # per-epoch (train.py:297)
        tm.eval()
        ref_vlogits = _torch_val_outputs(tm, xv, mv, use_meta, bs)
        with torch.no_grad():
            ref_vloss = float(np.mean([
                criterion(torch.from_numpy(ref_vlogits[s:s + bs]),
                          torch.from_numpy(yv[s:s + bs])).item()
                for s in range(0, (len(yv) // bs) * bs, bs)]))
        ref_auroc = _auroc(yv, ref_vlogits)
        ref_acc = float((ref_vlogits.argmax(-1) == yv).mean())

        # our epoch on the SAME batches
        our_losses = []
        for s in range(0, n_full, bs):
            sel = perm[s:s + bs]
            b = {"image": jnp.asarray(xt[sel]),
                 "label": jnp.asarray(yt[sel].astype(np.int32))}
            if use_meta:
                b["metadata"] = jnp.asarray(mt[sel])
            state, m = train_step(state, b)
            our_losses.append(float(m["loss"]))
        ours = _evaluate(eval_step, state.params, state.batch_stats,
                         _ValSource(), bs, 8, loss_fn=loss_fn)
        delta = abs(ours["auroc"] - ref_auroc)
        worst = max(worst, delta)
        ok = delta <= args.bar
        rows.append({"round": rnd, "ref_auroc": round(ref_auroc, 5),
                     "our_auroc": round(float(ours["auroc"]), 5),
                     "delta": round(float(delta), 5), "pass": ok})
        print(f"[parity] round {rnd}: "
              f"trn_loss ref {ref_loss:.4f} / ours {np.mean(our_losses):.4f}"
              f" | val_loss ref {ref_vloss:.4f} / ours {ours['loss']:.4f}"
              f" | acc ref {ref_acc:.4f} / ours {ours['accuracy']:.4f}"
              f" | AUROC ref {ref_auroc:.5f} / ours {ours['auroc']:.5f}"
              f" | delta {delta:.5f} {'PASS' if ok else 'FAIL'}",
              file=sys.stderr)

    all_ok = all(r["pass"] for r in rows)
    print(json.dumps({
        "metric": "auroc_parity_max_abs_delta",
        "value": round(worst, 6),
        "bar": args.bar,
        "pass": all_ok,
        "rounds": rows,
        "backbone": backbone,
        "loss": args.loss,
        "n_train": int(len(yt)),
        "n_val": int(len(yv)),
        "pre_training_logit_gap": pre_gap,
    }))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
