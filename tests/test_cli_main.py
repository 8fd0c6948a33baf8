"""End-to-end tests of the primary CLI entry points' main() functions.

The reference's user surface IS train.py's main (reference
train.py:378-474); these tests drive our equivalents above the argparse
layer on a synthetic on-disk ISIC tree with a tiny CPU config:

  * cli.train.main      — fold loop, logs, best checkpoint, ensemble .npy,
                          and --resume continuation
  * cli.train_federated.main — round history JSON + server checkpoint
  * cli.precompute_masks.main — mask PNGs matching ops/cvseg output
                          (reference precompute_masks.py:168-202)
  * cli.verify.main     — subprocess smoke on --device cpu (reference
                          verify_mps.py:352-363 exit-code contract)
"""

import json
import logging
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

CLASS_COLS = ["MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC", "UNK"]


@pytest.fixture(autouse=True)
def _fresh_cli_loggers():
    """cli.train.setup_logging caches handlers on named loggers; clear them
    so each test's log files land in its own tmp dir."""
    yield
    for name in list(logging.Logger.manager.loggerDict):
        if name.startswith("isic_"):
            logging.getLogger(name).handlers.clear()


def _write_split(root, split, names, labels, image_hw=40, missing=0):
    img_dir = root / f"ISIC_2019_{split}_Input"
    img_dir.mkdir(parents=True, exist_ok=True)
    onehot = np.zeros((len(names), 9))
    onehot[np.arange(len(names)), labels] = 1
    gt = pd.DataFrame(onehot, columns=CLASS_COLS)
    gt.insert(0, "image", names)
    gt.to_csv(root / f"ISIC_2019_{split}_GroundTruth.csv", index=False)
    pd.DataFrame({
        "image": names,
        "age_approx": [40.0] * len(names),
        "sex": ["male", "female"] * (len(names) // 2),
        "anatom_site_general": ["head/neck"] * len(names),
        "lesion_id": [f"{split}_L{i // 2}" for i in range(len(names))],
    }).to_csv(root / f"ISIC_2019_{split}_Metadata.csv", index=False)
    rng = np.random.default_rng(hash(split) % 2**32)
    for nm in names[:len(names) - missing]:
        arr = rng.integers(0, 255, (image_hw, image_hw, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{nm}.jpg")


@pytest.fixture
def isic_tree(tmp_path):
    root = tmp_path / "ISIC"
    train_names = [f"ISIC_{i:07d}" for i in range(24)]
    _write_split(root, "Training", train_names, np.arange(24) % 8)
    test_names = [f"ISIC_{i:07d}" for i in range(100, 108)]
    _write_split(root, "Test", test_names, np.arange(8))
    return root


def _tiny_yaml(tmp_path, isic_dir, epochs=1, n_splits=2):
    p = tmp_path / "tiny.yaml"
    p.write_text(f"""
seed: 42
data: {{isic_dir: {isic_dir}, use_segmentation_mask: false}}
model: {{backbone: vit_tiny_patch16_224, image_size: 32,
         compute_dtype: float32, drop_path_rate: 0.0}}
training:
  epochs: {epochs}
  batch_size: 4
  gradient_accumulation_steps: 1
  num_workers: 2
  cv: {{n_splits: {n_splits}}}
  tta: {{enabled: false}}
  ema: {{enabled: true, decay: 0.9}}
augmentation:
  train: {{rotation: 0, randaugment: {{enabled: false}}}}
  mixup: {{enabled: false}}
  cutmix: {{enabled: false}}
loss: {{type: ce}}
""")
    return str(p)


def test_train_main_end_to_end(isic_tree, tmp_path):
    """Full main(): data load → 2-fold loop → per-fold logs + best
    checkpoints → fold-averaged ensemble .npy + metrics (labelled test)."""
    from fedvit_tpu.cli.train import main

    log_dir = tmp_path / "logs"
    cfg = _tiny_yaml(tmp_path, isic_tree)
    assert main(["--config", cfg, "--log", str(log_dir)]) == 0

    assert (log_dir / "train_main.log").exists()
    main_log = (log_dir / "train_main.log").read_text()
    assert "2-Fold CV" in main_log
    for f in (0, 1):
        fold_dir = log_dir / f"fold{f}"
        assert (fold_dir / f"train_fold{f}.log").exists()
        assert (fold_dir / f"best_fold{f}").exists(), "best checkpoint"
    ens = np.load(log_dir / "ensemble_logits.npy")
    assert ens.shape == (8, 8) and np.isfinite(ens).all()


def test_train_main_resume_continues(isic_tree, tmp_path):
    """--resume restarts a fold from its saved epoch instead of epoch 1
    (our extension over the reference, which has no resume path)."""
    from fedvit_tpu.cli.train import main

    log_dir = tmp_path / "logs"
    cfg1 = _tiny_yaml(tmp_path, isic_tree, epochs=1)
    assert main(["--config", cfg1, "--log", str(log_dir), "--fold", "0"]) == 0
    fold_log = log_dir / "fold0" / "train_fold0.log"
    first = fold_log.read_text()
    assert " E01 " in first and "Resumed" not in first

    logging.getLogger("isic_fold0").handlers.clear()
    logging.getLogger("isic_main").handlers.clear()
    cfg2 = _tiny_yaml(tmp_path, isic_tree, epochs=2)
    assert main(["--config", cfg2, "--log", str(log_dir), "--fold", "0",
                 "--resume"]) == 0
    combined = fold_log.read_text()
    assert "Resumed from epoch 1" in combined
    assert " E02 " in combined
    # epoch 1 must not re-run after the resume marker
    assert " E01 " not in combined[combined.index("Resumed"):]


def test_train_federated_main(tmp_path):
    """Federated CLI on the synthetic fixture: writes the round history
    JSON (one entry per round) and the server checkpoint directory."""
    from fedvit_tpu.cli.train_federated import main

    log_dir = tmp_path / "logs_fed"
    cfg = _tiny_yaml(tmp_path, tmp_path)     # isic_dir unused with --synthetic
    # 8 clients: num_clients must tile the 8-virtual-device client mesh
    assert main(["--config", cfg, "--synthetic", "48", "--clients", "8",
                 "--rounds", "2", "--log", str(log_dir)]) == 0

    hist = json.loads((log_dir / "federated_history.json").read_text())
    assert len(hist) == 2
    assert all(np.isfinite(r["loss"]) for r in hist)
    ckpt_dir = log_dir / "ckpt"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir()), "server checkpoint"


def test_precompute_masks_main(isic_tree, tmp_path):
    """Mask CLI walks Training+Test dirs and writes one PNG per decodable
    image; pixel content must equal the ops/cvseg batch op's output."""
    import jax.numpy as jnp
    from fedvit_tpu.cli.precompute_masks import _decode, main
    from fedvit_tpu.ops.cvseg import segment_lesion_batch

    out_dir = tmp_path / "masks"
    assert main(["--isic_dir", str(isic_tree), "--output_dir", str(out_dir),
                 "--image_size", "32", "--workers", "2", "--batch", "4"]) == 0

    pngs = sorted(out_dir.glob("*.png"))
    assert len(pngs) == 24 + 8           # every image in both splits
    sample = isic_tree / "ISIC_2019_Training_Input" / "ISIC_0000003.jpg"
    arr = _decode(sample, 32).astype(np.float32) / 255.0
    expect = np.asarray(segment_lesion_batch(jnp.asarray(arr[None]), 32))[0]
    got = np.asarray(Image.open(out_dir / "ISIC_0000003.png"))
    np.testing.assert_array_equal(got, (expect[..., 0] * 255).astype(np.uint8))
    assert set(np.unique(got)) <= {0, 255}


def test_verify_cli_subprocess():
    """The smoke harness itself must keep running: exit 0 on CPU with every
    test reporting PASS (guards cli/verify.py against rot)."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)           # single CPU device is fine here
    proc = subprocess.run(
        [sys.executable, "-m", "fedvit_tpu.cli.verify", "--device", "cpu"],
        cwd=str(Path(__file__).resolve().parent.parent),
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "[FAIL]" not in proc.stdout
    assert proc.stdout.count("[PASS]") >= 12
