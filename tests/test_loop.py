"""End-to-end fold trainer on the synthetic fixture — the reference's
train_fold contract (epochs, EMA validation, best checkpoint, early stop,
TTA test eval, ensemble) plus true resume (which the reference lacks)."""

import numpy as np
import pytest

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.data.pipeline import ArrayDataSource
from fedvit_tpu.data.synthetic import make_synthetic_dataset
from fedvit_tpu.train.loop import run_experiment, train_fold


def loop_cfg(tmp, epochs=2, **over):
    raw = {
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32", "drop_path_rate": 0.0,
                  "metadata": {"enabled": True}},
        "data": {"use_segmentation_mask": False},
        "training": {
            "epochs": epochs, "batch_size": 16,
            "gradient_accumulation_steps": 1,
            "optimizer": {"lr": 3e-4},
            "scheduler": {"warmup_epochs": 1},
            "ema": {"enabled": True, "decay": 0.9},
            "early_stopping": {"patience": 50, "metric": "balanced_accuracy"},
            "tta": {"enabled": True, "n": 8},
            "num_workers": 1,
        },
        "augmentation": {
            "train": {"rotation": 0,
                      "randaugment": {"enabled": False},
                      "color_jitter": {"brightness": 0, "contrast": 0,
                                       "saturation": 0, "hue": 0}},
            "mixup": {"enabled": False}, "cutmix": {"enabled": False}},
        "loss": {"type": "ce"},
        "checkpoint": {"dir": str(tmp)},
    }
    def deep(d, u):
        for k, v in u.items():
            d[k] = deep(d.get(k, {}), v) if isinstance(v, dict) else v
        return d
    return from_dict(deep(raw, over))


@pytest.fixture(scope="module")
def sources():
    train = ArrayDataSource(make_synthetic_dataset(n=128, image_size=40,
                                                   seed=0))
    val = ArrayDataSource(make_synthetic_dataset(n=48, image_size=40, seed=1))
    test = ArrayDataSource(make_synthetic_dataset(n=33, image_size=40, seed=2))
    return train, val, test


def test_train_fold_end_to_end(tmp_path, sources):
    train, val, test = sources
    cfg = loop_cfg(tmp_path, epochs=2)
    logs = []
    res = train_fold(cfg, 0, train, val, test,
                     workdir=str(tmp_path), log=logs.append)
    assert res.logits.shape == (33, 8)
    assert np.isfinite(res.logits).all()
    # FoldResult contract: logits RAW, probs their softmax, metrics present
    assert np.allclose(res.probs.sum(-1), 1.0, atol=1e-5)
    assert not np.allclose(res.logits.sum(-1), 1.0, atol=1e-3)
    assert "auroc" in res.metrics
    text = "\n".join(logs)
    assert "New best" in text
    assert "Running TTA" in text


def test_resume_continues_from_epoch(tmp_path, sources):
    train, val, test = sources
    cfg = loop_cfg(tmp_path, epochs=2)
    logs1 = []
    train_fold(cfg, 1, train, val, None, workdir=str(tmp_path),
               log=logs1.append)
    # bump epochs and resume: must start at epoch 3
    cfg3 = loop_cfg(tmp_path, epochs=3)
    logs2 = []
    train_fold(cfg3, 1, train, val, None, workdir=str(tmp_path),
               log=logs2.append, resume=True)
    text = "\n".join(logs2)
    assert "Resumed from epoch 2" in text
    assert "E03" in text and "E01" not in text


def test_run_experiment_ensemble(tmp_path, sources):
    train, val, test = sources
    cfg = loop_cfg(tmp_path, epochs=1,
                   training={"tta": {"enabled": False}})
    res = run_experiment(cfg, [(train, val), (train, val)], test,
                         workdir=str(tmp_path), log=lambda s: None)
    assert len(res["fold_logits"]) == 2
    assert res["ensemble_logits"].shape == (33, 8)
    assert "ensemble_metrics" in res
    # the ensemble is the mean of the folds' RAW logits (reference
    # train.py:446-455 contract) — not of probabilities
    np.testing.assert_allclose(
        res["ensemble_logits"], np.mean(res["fold_logits"], axis=0))
    assert not np.allclose(res["ensemble_logits"].sum(-1), 1.0, atol=1e-3)
    # AUROC (north-star metric) must appear at every reporting level:
    # ensemble, per-fold test, and the mean±std aggregate (VERDICT r2 #2)
    assert "auroc" in res["ensemble_metrics"]
    assert all("auroc" in m for m in res["fold_metrics"])
    assert "auroc" in res["aggregate"]


def test_named_views_tta(tmp_path, sources):
    """Old-gen corner-crop TTA (reference data_old.py:208-304) reachable via
    training.tta.views; logits differ from the default 8-view TTA."""
    train, val, test = sources
    import jax
    from fedvit_tpu.train.loop import evaluate_with_tta, init_model_state, \
        optax_identity
    cfg = loop_cfg(tmp_path, epochs=1)
    model, state = init_model_state(cfg, optax_identity(), 0)
    named_cfg = loop_cfg(
        tmp_path, epochs=1,
        training={"tta": {"enabled": True,
                          "views": ["original", "hflip", "crop_tl",
                                    "crop_br", "crop_center"]}})
    p, l, logits_named = evaluate_with_tta(
        named_cfg, model, state.params, state.batch_stats, test)
    assert np.asarray(logits_named).shape == (33, 8)
    _, _, logits_default = evaluate_with_tta(
        cfg, model, state.params, state.batch_stats, test)
    assert not np.allclose(logits_named, logits_default)
    assert len(p) == len(l) == 33


def test_run_experiment_fold_aggregate(tmp_path, sources):
    """Per-fold mean±std aggregate (old-gen train_kfold, train_old.py:699-759)."""
    train, val, test = sources
    cfg = loop_cfg(tmp_path, epochs=1, training={"tta": {"enabled": False}})
    logs = []
    res = run_experiment(cfg, [(train, val), (train, val)], test,
                         workdir=None, log=logs.append)
    assert len(res["fold_metrics"]) == 2
    for k in ("accuracy", "balanced_accuracy", "macro_f1"):
        mu, sd = res["aggregate"][k]
        assert 0.0 <= mu <= 1.0 and sd >= 0.0
    text = "\n".join(logs)
    assert "K-FOLD AGGREGATE" in text
    # per-fold classification report + CM (reference train.py:365-366)
    assert "Confusion Matrix" in text
    assert "precision" in text


def test_early_stopping(tmp_path, sources):
    train, val, _ = sources
    cfg = loop_cfg(tmp_path, epochs=30,
                   training={"early_stopping": {"patience": 1},
                             "optimizer": {"lr": 0.0}})  # no learning → stop
    logs = []
    train_fold(cfg, 2, train, val, None, workdir=None, log=logs.append)
    assert any("Early stopping" in l for l in logs)


def test_two_stage_schedule(tmp_path, sources):
    train, val, _ = sources
    cfg = loop_cfg(tmp_path, epochs=1,
                   training={"two_stage": {"enabled": True,
                                           "stage1_epochs": 1,
                                           "stage1_lr": 1e-3}})
    logs = []
    train_fold(cfg, 3, train, val, None, workdir=None, log=logs.append)
    assert any("[stage1]" in l for l in logs)


def test_accumulation_contract(tmp_path, sources):
    """One optimizer step per MACRO batch (physical_bs × accum): after one
    epoch over N samples, state.step == N // (bs·accum) — pins the reviewed
    bug where train_fold fed physical batches to the accumulating step."""
    train, val, _ = sources  # 128 samples
    cfg = loop_cfg(tmp_path, epochs=1,
                   training={"batch_size": 8,
                             "gradient_accumulation_steps": 2})
    train_fold(cfg, 7, train, val, None, workdir=str(tmp_path),
               log=lambda s: None)
    from fedvit_tpu.train import checkpoint as ckpt
    from fedvit_tpu.train.loop import init_model_state, optax_identity
    from fedvit_tpu.train.optim import build_optimizer
    from fedvit_tpu.train.state import TrainState
    import jax
    model, st0 = init_model_state(cfg, optax_identity(), cfg.seed + 7)
    tx, _ = build_optimizer(cfg, st0.params, 8)
    state = TrainState.create(model.apply, st0.params, st0.batch_stats, tx,
                              jax.random.key(0))
    meta = ckpt.load_checkpoint(str(tmp_path / "resume_fold7"), state)
    assert int(meta["state"].step) == 128 // (8 * 2), (
        f"expected 8 optimizer steps, got {int(meta['state'].step)}")


def test_class_weights_reach_the_fold_loss(tmp_path, sources, monkeypatch):
    """`loss.class_weights: true` must hand balanced weights (computed from
    the fold's TRAIN labels only) to build_loss — silently no-op'd before
    round 5 (same fix as the federated path)."""
    import dataclasses
    import fedvit_tpu.train.loop as loop_mod
    from fedvit_tpu.data.sampling import compute_class_weights

    train, val, test = sources
    cfg = loop_cfg(tmp_path, epochs=1)
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, class_weights=True))

    captured = {}
    real = loop_mod.build_loss

    def spy(c, class_weights=None):
        captured["w"] = class_weights
        return real(c, class_weights)

    monkeypatch.setattr(loop_mod, "build_loss", spy)
    res = train_fold(cfg, 0, train, val, test, workdir=str(tmp_path),
                     log=lambda s: None)
    assert np.isfinite(res.logits).all()
    assert captured["w"] is not None, "weights never reached build_loss"
    expect = compute_class_weights(train.labels, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(captured["w"]), expect, rtol=1e-6)
