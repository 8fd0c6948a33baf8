"""fp32 parity against the ACTUAL reference implementation — the north-star
acceptance test (BASELINE.md).

The real /root/reference modules are imported (via tests/reference_oracle
shims) and run side-by-side with our framework on identical weights and
identical data:

  (a) model-level: ISICClassifier logits match at fp32 (3-ch, 4-ch + mask,
      with/without metadata, zero-filled-metadata path) —
      reference model.py:67-207 vs fedvit_tpu.models.isic.
  (b) epoch-level: reference train.validate (train.py:175-214) vs our
      train.loop._evaluate on the same weights/data — loss + all metrics.
  (c) training-level: one full epoch of reference train_one_epoch
      (train.py:95-168, AdamW + LLRD + clip) vs our jitted train_step on the
      same batches — parameters still match, and post-training val metrics /
      AUROC agree within the ±0.005 north-star budget.

Deliberate deviation covered by (c): the reference's LLRD drops ViT
cls_token/pos_embed from the optimizer entirely (model.py:236-270 builds
groups only for patch_embed/blocks/norm/head — a latent bug, SURVEY §2.1
C13); we train them at the lowest LLRD scale. The test asserts exactly that:
all reference-trained params match, ours-only trained params moved.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

sys.path.insert(0, str(Path(__file__).parent))
from reference_oracle import load_reference  # noqa: E402

from fedvit_tpu.core.config import from_dict  # noqa: E402
from fedvit_tpu.models import build_model  # noqa: E402
from fedvit_tpu.models.import_weights import import_torch_isic  # noqa: E402

DEPTH = 12  # vit_tiny
SIZE = 64


def _cfg(in_channels: int, metadata_enabled: bool):
    return from_dict({
        "model": {"backbone": "vit_tiny_patch16_64", "image_size": SIZE,
                  "compute_dtype": "float32", "drop_path_rate": 0.0,
                  "pool": "cls",
                  "metadata": {"enabled": metadata_enabled, "dropout": 0.0},
                  "classifier": {"dropout": 0.0}},
        "data": {"use_segmentation_mask": in_channels == 4,
                 "on_device_masks": False},
        "training": {"epochs": 1, "batch_size": 16,
                     "gradient_accumulation_steps": 1,
                     "optimizer": {"lr": 1e-4, "weight_decay": 1e-5},
                     "scheduler": {"warmup_epochs": 0, "min_lr": 1e-6},
                     "llrd": {"enabled": True, "decay_rate": 0.75,
                              "head_lr_mult": 10.0},
                     "ema": {"enabled": False},
                     "grad_clip": 1.0},
        "augmentation": {"mixup": {"enabled": False},
                         "cutmix": {"enabled": False}},
        "loss": {"type": "ce"},
    })


def build_pair(in_channels: int, metadata_enabled: bool, seed: int = 0):
    """Reference ISICClassifier + our model carrying IDENTICAL weights."""
    ref = load_reference()
    torch.manual_seed(seed)
    tm = ref.model.ISICClassifier(
        backbone_name=f"vit_tiny_patch16_{SIZE}", num_classes=8,
        image_size=SIZE, in_channels=in_channels, pretrained=False,
        drop_path_rate=0.0, metadata_enabled=metadata_enabled,
        meta_dropout=0.0, cls_dropout=0.0)
    tm = tm.float().eval()

    cfg = _cfg(in_channels, metadata_enabled)
    jm = build_model(cfg)
    rng = jax.random.key(seed)
    variables = jm.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, SIZE, SIZE, in_channels), jnp.float32),
        jnp.zeros((2, 13), jnp.float32) if metadata_enabled else None)
    variables = import_torch_isic(tm.state_dict(), variables, depth=DEPTH)
    return tm, jm, variables, cfg


def _torch_logits(tm, x_nhwc: np.ndarray, md: "np.ndarray | None"):
    with torch.no_grad():
        out = tm(torch.from_numpy(x_nhwc).permute(0, 3, 1, 2),
                 metadata=torch.from_numpy(md) if md is not None else None)
    return out["logits"].numpy()


def _our_logits(jm, variables, x_nhwc: np.ndarray, md: "np.ndarray | None"):
    out = jm.apply(variables, jnp.asarray(x_nhwc),
                   jnp.asarray(md) if md is not None else None,
                   deterministic=True)
    return np.asarray(out["logits"])


# ---------------------------------------------------------------------------
# (a) model-level logits parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("in_ch,meta,pass_meta", [
    (3, False, False),           # plain RGB, no metadata branch
    (4, True, True),             # production shape: RGB+mask, metadata
    (4, True, False),            # zero-filled metadata path (model.py:199-203)
])
def test_logits_match_reference_fp32(in_ch, meta, pass_meta):
    tm, jm, variables, _ = build_pair(in_ch, meta)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, SIZE, SIZE, in_ch)).astype(np.float32)
    md = (rng.uniform(size=(4, 13)).astype(np.float32) if pass_meta else None)
    ref = _torch_logits(tm, x, md)
    ours = _our_logits(jm, variables, x, md)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_logits_match_on_synthetic_isic_batch():
    """Parity holds on ImageNet-normalized synthetic-ISIC inputs, not just
    unit-normal noise."""
    from fedvit_tpu.data.synthetic import make_synthetic_dataset
    from fedvit_tpu.ops.image import normalize
    tm, jm, variables, _ = build_pair(3, True)
    data = make_synthetic_dataset(n=8, image_size=SIZE, seed=3)
    x = np.asarray(normalize(jnp.asarray(data["image"])), np.float32)
    md = data["metadata"].astype(np.float32)
    np.testing.assert_allclose(_our_logits(jm, variables, x, md),
                               _torch_logits(tm, x, md),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# (b) epoch-level eval parity: reference validate vs our _evaluate
# ---------------------------------------------------------------------------

class _ArraySource:
    """Minimal eval source yielding exact float batches (no uint8 round-trip)."""

    def __init__(self, images, labels, metadata):
        self.images, self.labels, self.metadata = images, labels, metadata

    def __len__(self):
        return len(self.labels)

    def sequential_batches(self, batch_size):
        for s in range(0, len(self.labels), batch_size):
            yield {"image": self.images[s:s + batch_size],
                   "label": self.labels[s:s + batch_size],
                   "metadata": self.metadata[s:s + batch_size]}


def test_validate_metrics_match_reference():
    ref = load_reference()
    tm, jm, variables, cfg = build_pair(3, True)
    rng = np.random.default_rng(2)
    n = 52                       # ragged: 16+16+16+4
    x = rng.normal(size=(n, SIZE, SIZE, 3)).astype(np.float32)
    labels = rng.integers(0, 8, n).astype(np.int64)
    md = rng.uniform(size=(n, 13)).astype(np.float32)

    ds = [{"image": torch.from_numpy(x[i]).permute(2, 0, 1),
           "label": int(labels[i]),
           "metadata": torch.from_numpy(md[i])} for i in range(n)]
    loader = torch.utils.data.DataLoader(ds, batch_size=16, shuffle=False)
    ref_m = ref.train.validate(
        tm, loader, nn.CrossEntropyLoss(), torch.device("cpu"),
        {"training": {"use_amp": False},
         "model": {"metadata": {"enabled": True}}})

    from fedvit_tpu.train.loop import _evaluate
    from fedvit_tpu.train.losses import cross_entropy_loss
    from fedvit_tpu.train.step import make_eval_step
    eval_step = make_eval_step(jm.apply, cfg, cross_entropy_loss)
    src = _ArraySource(x, labels.astype(np.int32), md)
    ours = _evaluate(eval_step, variables["params"],
                     variables["batch_stats"], src, 16, 8,
                     loss_fn=cross_entropy_loss)

    assert ours["accuracy"] == pytest.approx(ref_m["accuracy"], abs=1e-12)
    assert ours["balanced_accuracy"] == pytest.approx(
        ref_m["balanced_accuracy"], abs=1e-9)
    assert ours["macro_f1"] == pytest.approx(ref_m["macro_f1"], abs=1e-9)
    assert ours["loss"] == pytest.approx(ref_m["loss"], abs=2e-6)

    # AUROC north star (±0.005): our AUROC vs sklearn on the torch probs
    from sklearn.metrics import roc_auc_score
    with torch.no_grad():
        tl = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                metadata=torch.from_numpy(md))["logits"]
        tp = torch.softmax(tl, -1).numpy()
    ref_auroc = roc_auc_score(labels, tp, multi_class="ovr",
                              average="macro")
    assert ours["auroc"] == pytest.approx(ref_auroc, abs=0.005)


# ---------------------------------------------------------------------------
# (c) training parity: one epoch, identical batches, AdamW + LLRD + clip
# ---------------------------------------------------------------------------

def test_one_epoch_training_parity():
    ref = load_reference()
    tm, jm, variables, cfg = build_pair(3, False)
    rng = np.random.default_rng(4)
    n, bs = 128, 16
    x = rng.normal(size=(n, SIZE, SIZE, 3)).astype(np.float32) * 0.5
    labels = rng.integers(0, 8, n).astype(np.int64)

    # ---- reference epoch: real train_one_epoch --------------------------
    tm.train()
    groups = ref.model.get_layerwise_lr_groups(
        tm, base_lr=1e-4, decay_rate=0.75, weight_decay=1e-5)
    opt = torch.optim.AdamW(groups, weight_decay=1e-5)
    # (scheduler steps per-epoch AFTER the epoch, train.py:297 — with one
    # epoch both sides train at the group base LRs; schedule-curve parity is
    # covered by tests/test_schedule.py)
    scaler = torch.amp.GradScaler("cpu", enabled=False)
    ds = [{"image": torch.from_numpy(x[i]).permute(2, 0, 1),
           "label": int(labels[i])} for i in range(n)]
    loader = torch.utils.data.DataLoader(ds, batch_size=bs, shuffle=False)
    import logging
    ref_cfg = {"training": {"use_amp": False, "grad_clip": 1.0,
                            "gradient_accumulation_steps": 1},
               "model": {"metadata": {"enabled": False}},
               "augmentation": {"mixup": {"alpha": 0.0},
                                "cutmix": {"prob": 0.0}}}
    ref_loss = ref.train.train_one_epoch(
        tm, loader, nn.CrossEntropyLoss(), opt, None, scaler, None,
        torch.device("cpu"), ref_cfg, 1, logging.getLogger("parity"))
    tm.eval()

    # ---- our epoch: jitted train_step on the SAME batches ----------------
    from fedvit_tpu.train.losses import cross_entropy_loss
    from fedvit_tpu.train.optim import build_optimizer
    from fedvit_tpu.train.state import TrainState
    from fedvit_tpu.train.step import make_train_step
    tx, _ = build_optimizer(cfg, variables["params"],
                            steps_per_epoch=n // bs)
    # donation (default-on) consumes the state's buffers — deep-copy so
    # variables["params"] stays alive for the start_flat comparison below
    state = TrainState.create(jm.apply,
                              jax.tree.map(jnp.array, variables["params"]),
                              jax.tree.map(jnp.array,
                                           variables["batch_stats"]), tx,
                              jax.random.key(0), ema_enabled=False)
    step = make_train_step(cfg, cross_entropy_loss)
    our_losses = []
    for s in range(0, n, bs):
        state, m = step(state, {"image": jnp.asarray(x[s:s + bs]),
                                "label": jnp.asarray(labels[s:s + bs])})
        our_losses.append(float(m["loss"]))
    # per-step losses track within ~2e-4 (fp32 reduction-order noise; a
    # semantic mismatch — wrong LLRD scale, clip, or wd — shows at ≥1e-2)
    assert np.mean(our_losses) == pytest.approx(ref_loss, abs=1e-3)

    # ---- parameters still match (except the documented deviation) --------
    fresh = jm.init({"params": jax.random.key(9), "dropout": jax.random.key(9)},
                    jnp.zeros((2, SIZE, SIZE, 3), jnp.float32), None)
    ref_trained = import_torch_isic(tm.state_dict(), fresh, depth=DEPTH)
    from flax import traverse_util
    ours_flat = traverse_util.flatten_dict(state.params)
    ref_flat = traverse_util.flatten_dict(ref_trained["params"])
    start_flat = traverse_util.flatten_dict(variables["params"])
    from fedvit_tpu.train.optim import llrd_scale_tree
    scale_flat = traverse_util.flatten_dict(
        llrd_scale_tree(variables["params"], 0.75, 10.0))
    skipped = {("backbone", "cls_token"), ("backbone", "pos_embed")}
    for k in ref_flat:
        ours_v, ref_v = np.asarray(ours_flat[k]), np.asarray(ref_flat[k])
        if k in skipped:
            # reference LLRD drops cls/pos from the optimizer (latent bug,
            # model.py:236-270); we train them at the lowest scale
            np.testing.assert_allclose(ref_v, np.asarray(start_flat[k]),
                                       atol=0, err_msg=str(k))
            assert not np.allclose(ours_v, ref_v, atol=0), k
            np.testing.assert_allclose(ours_v, ref_v, atol=5e-5,
                                       err_msg=str(k))
        else:
            # Tight tier: relative L2 per leaf (catches any systematic error:
            # wrong LLRD scale, clip, weight decay, schedule).
            # Noise tier: Adam's bias-corrected early steps are ≈±1·lr_leaf
            # per element, so where the true gradient is a near-cancelling
            # residual (LayerNorm biases), fp32 reduction-order noise flips
            # signs between frameworks and elements take OPPOSITE full steps.
            # That is bounded by 2·steps·lr_leaf per element — anything
            # beyond it is real divergence.
            denom = float(np.linalg.norm(ref_v)) or 1.0
            rel = float(np.linalg.norm(ours_v - ref_v)) / denom
            if rel >= 2e-3:
                lr_leaf = 1e-4 * float(scale_flat[k])
                noise_bound = 2.2 * (n // bs) * lr_leaf
                max_abs = float(np.max(np.abs(ours_v - ref_v)))
                assert max_abs <= noise_bound, (
                    f"trained param diverged: {k} (rel L2 {rel:.2e}, "
                    f"max abs {max_abs:.2e} > noise bound {noise_bound:.2e})")

    # ---- post-training eval: metrics + AUROC within ±0.005 ---------------
    vx = rng.normal(size=(48, SIZE, SIZE, 3)).astype(np.float32) * 0.5
    vlabels = rng.integers(0, 8, 48).astype(np.int64)
    with torch.no_grad():
        tlog = tm(torch.from_numpy(vx).permute(0, 3, 1, 2),
                  metadata=None)["logits"].numpy()
    olog = _our_logits(jm, {"params": state.params,
                            "batch_stats": state.batch_stats}, vx, None)
    from sklearn.metrics import roc_auc_score
    tprob = np.exp(tlog - tlog.max(-1, keepdims=True))
    tprob /= tprob.sum(-1, keepdims=True)
    oprob = np.exp(olog - olog.max(-1, keepdims=True))
    oprob /= oprob.sum(-1, keepdims=True)
    ref_auroc = roc_auc_score(vlabels, tprob, multi_class="ovr",
                              average="macro")
    our_auroc = roc_auc_score(vlabels, oprob, multi_class="ovr",
                              average="macro")
    assert abs(our_auroc - ref_auroc) < 0.005
    # post-training logits: the LN-bias sign-noise (see param loop above)
    # propagates ~7e-3 absolute after one epoch; real divergence is O(0.1+)
    np.testing.assert_allclose(olog, tlog, atol=2e-2)


# ---------------------------------------------------------------------------
# TorchBatchNorm running-stat convention
# ---------------------------------------------------------------------------

def test_batchnorm_running_stats_match_torch():
    """Our MetadataBranch BN must track torch's UNBIASED running variance
    (flax's nn.BatchNorm stores the biased one) so eval-after-training
    matches the reference."""
    torch.manual_seed(0)
    tbn = nn.BatchNorm1d(6)
    tbn.train()
    from fedvit_tpu.models.layers import TorchBatchNorm
    jbn = TorchBatchNorm()
    v = jbn.init(jax.random.key(0), jnp.zeros((4, 6)),
                 use_running_average=False)
    stats = v["batch_stats"]
    rng = np.random.default_rng(0)
    for _ in range(3):
        xb = rng.normal(size=(8, 6)).astype(np.float32) * 2 + 1
        ty = tbn(torch.from_numpy(xb)).detach().numpy()
        jy, mut = jbn.apply({"params": v["params"], "batch_stats": stats},
                            jnp.asarray(xb), use_running_average=False,
                            mutable=["batch_stats"])
        stats = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)
    # eval mode uses the running stats identically
    tbn.eval()
    xe = rng.normal(size=(5, 6)).astype(np.float32)
    te = tbn(torch.from_numpy(xe)).detach().numpy()
    je = jbn.apply({"params": v["params"], "batch_stats": stats},
                   jnp.asarray(xe), use_running_average=True)
    np.testing.assert_allclose(np.asarray(je), te, rtol=1e-5, atol=1e-5)
