"""Inference CLI (cli/predict.py) — checkpoint → predictions end-to-end.

The reference has no inference entry (SURVEY.md §1 L6); this covers the
deployment path we add on top: fold-checkpoint loading, EMA param selection,
directory-of-images input, logit ensembling, CSV/npy output.
"""

import json

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from fedvit_tpu.core.config import to_dict
from fedvit_tpu.data.constants import VALID_CLASSES
from fedvit_tpu.train.loop import train_fold

from test_loop import loop_cfg, sources  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def trained(tmp_path_factory, sources):  # noqa: F811
    tmp = tmp_path_factory.mktemp("predict")
    train, val, _ = sources
    cfg = loop_cfg(tmp, epochs=1)
    train_fold(cfg, 0, train, val, None, workdir=str(tmp), log=lambda s: None)
    # JSON is a YAML subset — safe_load reads it back for load_config
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(json.dumps(to_dict(cfg)))
    imgdir = tmp / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(imgdir / f"lesion_{i}.jpg")
    return tmp, cfg_path, imgdir


def test_predict_images_dir(tmp_path, trained):
    tmp, cfg_path, imgdir = trained
    from fedvit_tpu.cli.predict import main
    out = tmp_path / "preds.csv"
    logits_out = tmp_path / "logits.npy"
    rc = main(["--config", str(cfg_path),
               "--checkpoint", str(tmp / "best_fold0"),
               "--images", str(imgdir),
               "--output", str(out), "--logits_out", str(logits_out),
               "--batch_size", "4"])
    assert rc == 0
    df = pd.read_csv(out)
    assert list(df["image"]) == [f"lesion_{i}" for i in range(5)]
    assert set(df["prediction"]).issubset(set(VALID_CLASSES))
    probs = df[[f"prob_{c}" for c in VALID_CLASSES]].to_numpy()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    logits = np.load(logits_out)
    assert logits.shape == (5, 8)
    # the CSV probs are the softmax of the saved logits
    e = np.exp(logits - logits.max(-1, keepdims=True))
    np.testing.assert_allclose(probs, e / e.sum(-1, keepdims=True), atol=1e-5)


def test_predict_ensemble_and_tta(tmp_path, trained):
    tmp, cfg_path, imgdir = trained
    from fedvit_tpu.cli.predict import main
    out = tmp_path / "preds.csv"
    # same checkpoint twice — the two-fold "ensemble" must equal one fold
    rc = main(["--config", str(cfg_path),
               "--checkpoint", str(tmp / "best_fold0"),
               "--checkpoint", str(tmp / "best_fold0"),
               "--images", str(imgdir),
               "--output", str(out), "--logits_out",
               str(tmp_path / "l2.npy"), "--batch_size", "4"])
    assert rc == 0
    single = tmp_path / "single.csv"
    main(["--config", str(cfg_path),
          "--checkpoint", str(tmp / "best_fold0"),
          "--images", str(imgdir), "--output", str(single),
          "--batch_size", "4"])
    a = pd.read_csv(out)[[f"prob_{c}" for c in VALID_CLASSES]].to_numpy()
    b = pd.read_csv(single)[[f"prob_{c}" for c in VALID_CLASSES]].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-6)

    # TTA path runs and yields normalized probabilities
    rc = main(["--config", str(cfg_path),
               "--checkpoint", str(tmp / "best_fold0"),
               "--images", str(imgdir),
               "--output", str(tmp_path / "tta.csv"), "--tta",
               "--batch_size", "4"])
    assert rc == 0
    t = pd.read_csv(tmp_path / "tta.csv")
    probs = t[[f"prob_{c}" for c in VALID_CLASSES]].to_numpy()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_predict_missing_checkpoint(tmp_path, trained):
    _, cfg_path, imgdir = trained
    from fedvit_tpu.cli.predict import main
    with pytest.raises(SystemExit):
        main(["--config", str(cfg_path),
              "--checkpoint", str(tmp_path / "nope"),
              "--images", str(imgdir),
              "--output", str(tmp_path / "x.csv")])
