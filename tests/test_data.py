"""Data layer — splits vs stratification/group properties (sklearn as the
behavioral oracle), CSV assembly on a synthetic ISIC tree, sampling laws,
host→device pipeline."""

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.data.constants import META_DIM
from fedvit_tpu.data.isic import (has_real_test_labels, load_isic_data,
                                  parse_groundtruth_csv)
from fedvit_tpu.data.pipeline import HostDataSource, canvas_size, make_device_augment
from fedvit_tpu.data.sampling import (class_balanced_weights,
                                      compute_class_weights, epoch_indices)
from fedvit_tpu.data.splits import (make_cv_splits, stratified_group_kfold,
                                    stratified_kfold)


# ---------------------------------------------------------------------------
# Splits
# ---------------------------------------------------------------------------

def test_stratified_kfold_properties():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 8, 1000)
    splits = stratified_kfold(labels, 5, seed=42)
    assert len(splits) == 5
    all_val = np.sort(np.concatenate([v for _, v in splits]))
    assert (all_val == np.arange(1000)).all()  # each sample in exactly 1 val fold
    for train, val in splits:
        assert len(np.intersect1d(train, val)) == 0
        # per-class proportions match within 2 samples
        for c in range(8):
            n_c = (labels == c).sum()
            in_val = (labels[val] == c).sum()
            assert abs(in_val - n_c / 5) <= 2


def test_stratified_group_kfold_group_disjoint():
    rng = np.random.default_rng(1)
    groups = rng.integers(0, 200, 1000)
    labels = (groups * 7 + rng.integers(0, 2, 1000)) % 8  # label correlated with group
    splits = stratified_group_kfold(labels, groups, 5, seed=42)
    for train, val in splits:
        assert len(set(groups[train]) & set(groups[val])) == 0, \
            "groups must not straddle folds (patient leakage)"
    # stratification: per-fold class histograms roughly equal
    hists = np.stack([np.bincount(labels[v], minlength=8) for _, v in splits])
    assert hists.std(axis=0).mean() < hists.mean() * 0.5


def test_make_cv_splits_dispatch():
    labels = np.arange(100) % 8
    s1 = make_cv_splits(labels, None, 5, 42)
    s2 = make_cv_splits(labels, np.arange(100) // 2, 5, 42)
    s3 = make_cv_splits(labels, np.zeros(100), 5, 42)  # single group → plain
    assert len(s1) == len(s2) == len(s3) == 5


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def test_class_balanced_weights_law():
    labels = np.array([0] * 90 + [1] * 10)
    p = class_balanced_weights(labels, 2)
    # each class gets half the total probability mass
    assert abs(p[labels == 0].sum() - 0.5) < 1e-9
    assert abs(p[labels == 1].sum() - 0.5) < 1e-9


def test_weighted_epoch_balances_classes():
    rng = np.random.default_rng(0)
    labels = np.array([0] * 900 + [1] * 100)
    plan = epoch_indices(labels, 50, rng, weighted=True)
    sampled = labels[plan.reshape(-1)]
    frac1 = (sampled == 1).mean()
    assert 0.4 < frac1 < 0.6, f"minority class fraction {frac1}"


def test_compute_class_weights_balanced():
    labels = np.array([0] * 30 + [1] * 10)
    w = compute_class_weights(labels, 2)
    # sklearn 'balanced': n/(k*count)
    assert np.allclose(w, [40 / (2 * 30), 40 / (2 * 10)])


# ---------------------------------------------------------------------------
# CSV assembly on a synthetic ISIC tree
# ---------------------------------------------------------------------------

@pytest.fixture
def isic_tree(tmp_path):
    d = tmp_path / "ISIC"
    (d / "ISIC_2019_Training_Input").mkdir(parents=True)
    n = 20
    names = [f"ISIC_{i:07d}" for i in range(n)]
    onehot = np.zeros((n, 9))
    labels = np.arange(n) % 8
    onehot[np.arange(n), labels] = 1
    onehot[-1] = 0
    onehot[-1, 8] = 1  # one UNK row → dropped
    gt = pd.DataFrame(onehot, columns=["MEL", "NV", "BCC", "AK", "BKL", "DF",
                                       "VASC", "SCC", "UNK"])
    gt.insert(0, "image", names)
    gt.to_csv(d / "ISIC_2019_Training_GroundTruth.csv", index=False)

    meta = pd.DataFrame({
        "image": names,
        "age_approx": [50] * (n - 2) + [np.nan, 120],
        "sex": ["male", "female"] * (n // 2),
        "anatom_site_general": ["head/neck"] * (n - 1) + [None],
        "lesion_id": [f"L{i//2}" for i in range(n)],
    })
    meta.to_csv(d / "ISIC_2019_Training_Metadata.csv", index=False)

    rng = np.random.default_rng(0)
    for nm in names[:-2]:   # leave 2 images missing on disk
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / "ISIC_2019_Training_Input" / f"{nm}.jpg")
    return d


def test_load_isic_data(isic_tree):
    logs = []
    train_df, test_df = load_isic_data(str(isic_tree), log=logs.append)
    # 20 rows − 1 UNK − at least 1 missing file (the UNK row also has no label)
    assert "dx" in train_df and "label" in train_df
    assert (train_df["dx"] != "UNK").all()
    assert len(train_df) == 18  # 19 valid − 1 missing-on-disk (UNK row had no file either)
    # age semantics: fillna(50)/90, clip to 90
    assert abs(train_df["age_norm"].iloc[0] - 50 / 90) < 1e-9
    assert train_df["age_norm"].max() <= 1.0
    # sex/site vocab
    assert set(train_df["sex_idx"]) <= {0, 1, 2}
    assert set(train_df["site_idx"]) <= set(range(9))
    # lesion_id groups exist
    assert train_df["lesion_id"].nunique() > 1
    # no test data
    assert len(test_df) == 0
    assert not has_real_test_labels(test_df)


def test_groundtruth_parse_unk_dropped(isic_tree):
    df = parse_groundtruth_csv(isic_tree / "ISIC_2019_Training_GroundTruth.csv")
    assert len(df) == 19 and (df["label"] < 8).all()


def _add_test_split(isic_tree, with_gt):
    """Extend the synthetic tree with a test split (ref data.py:396-426
    semantics: GT+meta → labelled, meta+images only → placeholder labels)."""
    (isic_tree / "ISIC_2019_Test_Input").mkdir()
    names = [f"ISIC_{i:07d}" for i in range(100, 106)]
    rng = np.random.default_rng(1)
    for nm in names[:-1]:   # one test image missing on disk
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(isic_tree / "ISIC_2019_Test_Input" / f"{nm}.jpg")
    meta = pd.DataFrame({
        "image": names,
        "age_approx": [30, 60, None, 45, 80, 20],
        "sex": ["male", None, "female", "male", "female", "male"],
        "anatom_site_general_challenge": ["anterior torso"] * 6,
    })
    meta.to_csv(isic_tree / "ISIC_2019_Test_Metadata.csv", index=False)
    if with_gt:
        onehot = np.zeros((6, 9))
        onehot[np.arange(6), [0, 1, 2, 3, 1, 8]] = 1   # last row UNK
        gt = pd.DataFrame(onehot, columns=["MEL", "NV", "BCC", "AK", "BKL",
                                           "DF", "VASC", "SCC", "UNK"])
        gt.insert(0, "image", names)
        gt.to_csv(isic_tree / "ISIC_2019_Test_GroundTruth.csv", index=False)
    return names


def test_load_isic_data_labelled_test_split(isic_tree):
    """GT + metadata present: labelled test frame, UNK dropped, missing
    files dropped, real labels detected (ref data.py:396-410)."""
    _add_test_split(isic_tree, with_gt=True)
    _, test_df = load_isic_data(str(isic_tree), log=lambda s: None)
    # 6 rows − 1 UNK; the missing-on-disk image was the UNK row's? No:
    # names[-1] (UNK) has no file AND no valid label — both drops overlap
    assert len(test_df) == 5
    assert list(test_df["label"]) == [0, 1, 2, 3, 1]
    assert has_real_test_labels(test_df)
    # metadata encodings rode through the merge
    assert abs(test_df["age_norm"].iloc[2] - 50 / 90) < 1e-9   # NaN → 50/90
    assert test_df["sex_idx"].iloc[1] == 2                     # NaN → unknown
    assert (test_df["site_idx"] == 0).all()        # anterior torso, alt column


def test_load_isic_data_unlabelled_test_split(isic_tree):
    """Metadata + images but NO GT: placeholder dx='MEL'/label=0 rows for
    images that exist on disk, and the placeholder gate stays closed
    (ref data.py:411-423 + train.py:361)."""
    _add_test_split(isic_tree, with_gt=False)
    _, test_df = load_isic_data(str(isic_tree), log=lambda s: None)
    assert len(test_df) == 5            # 6 metadata rows − 1 missing file
    assert (test_df["dx"] == "MEL").all() and (test_df["label"] == 0).all()
    assert not has_real_test_labels(test_df)
    assert all(str(p).endswith(".jpg") for p in test_df["image_path"])


def test_load_metadata_fallbacks(tmp_path):
    """Column-absence fallbacks (ref data.py:353-375): lesion_id ← image,
    age_norm ← 0.5, sex/site ← unknown index; out-of-vocab strings also
    land on unknown."""
    from fedvit_tpu.data.isic import load_metadata
    p = tmp_path / "meta.csv"
    pd.DataFrame({"image": ["a", "b"]}).to_csv(p, index=False)
    df = load_metadata(p)
    assert list(df["lesion_id"]) == ["a", "b"]
    assert (df["age_norm"] == 0.5).all()
    assert (df["sex_idx"] == 2).all() and (df["site_idx"] == 8).all()

    pd.DataFrame({"image": ["a"], "age_approx": [200], "sex": ["MALE"],
                  "anatom_site_general": ["weird-site"]}).to_csv(p, index=False)
    df = load_metadata(p)
    assert df["age_norm"].iloc[0] == 1.0         # clip(0, 90)/90
    assert df["sex_idx"].iloc[0] == 0            # lowercased through vocab
    assert df["site_idx"].iloc[0] == 8           # OOV → unknown


# ---------------------------------------------------------------------------
# Host pipeline → device augmentation
# ---------------------------------------------------------------------------

def test_host_pipeline_and_device_augment(isic_tree):
    cfg = from_dict({
        "data": {"isic_dir": str(isic_tree), "use_segmentation_mask": True,
                 "on_device_masks": True},
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32"},
        "training": {"batch_size": 4, "num_workers": 2},
    })
    train_df, _ = load_isic_data(str(isic_tree), log=lambda s: None)
    src = HostDataSource(train_df, cfg, cache=True)
    assert src.canvas == canvas_size(32)

    rng = np.random.default_rng(0)
    batch = next(src.epoch_batches(4, rng, weighted=True))
    assert batch["image"].shape == (4, src.canvas, src.canvas, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["metadata"].shape == (4, META_DIM)

    import jax
    import jax.numpy as jnp
    aug = make_device_augment(cfg, train=True)
    out = jax.jit(aug)({k: jnp.asarray(v) for k, v in batch.items()},
                       jax.random.key(0))
    assert out["image"].shape == (4, 32, 32, 4)  # RGB + on-device mask
    assert np.isfinite(np.asarray(out["image"])).all()

    aug_eval = make_device_augment(cfg, train=False)
    out_e = jax.jit(aug_eval)({k: jnp.asarray(v) for k, v in batch.items()},
                              jax.random.key(0))
    assert out_e["image"].shape == (4, 32, 32, 4)


def test_pipeline_mask_png_packing(isic_tree, tmp_path):
    # write mask PNGs for each image; pipeline should pack them as channel 4
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    train_df, _ = load_isic_data(str(isic_tree), log=lambda s: None)
    for nm in train_df["image"]:
        Image.fromarray(np.full((16, 16), 255, np.uint8)).save(
            mask_dir / f"{nm}.png")
    cfg = from_dict({
        "data": {"use_segmentation_mask": True,
                 "segmentation_mask_dir": str(mask_dir)},
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32"},
        "training": {"num_workers": 2},
    })
    src = HostDataSource(train_df, cfg)
    batch = src.gather(np.arange(3))
    assert batch["image"].shape[-1] == 4
    assert batch["image"][..., 3].max() == 255


def test_bytelru_eviction_never_breaks_inflight_batch():
    # Regression (ADVICE r2): a budget-full LRU whose own batch inserts evict
    # earlier members must not KeyError when the batch is assembled — gather
    # serves from a local dict, cache is write-through only.
    from fedvit_tpu.data.pipeline import _ByteLRU

    item = np.zeros((16, 16, 3), np.uint8)   # 768 bytes
    lru = _ByteLRU(budget_bytes=2 * item.nbytes + 1)   # holds ~2 items
    for k in range(6):
        lru[k] = item.copy()
    # atomic get: evicted keys return None, live keys return the array
    assert lru.get(0) is None
    assert lru.get(5) is not None
    with pytest.raises(KeyError):
        _ = lru[0]


def test_bytelru_tiny_budget_in_gather(isic_tree):
    # End-to-end: cache budget smaller than one batch — every gather both
    # inserts and evicts; the batch must still come back complete.
    train_df, _ = load_isic_data(str(isic_tree), log=lambda s: None)
    cfg = from_dict({
        "data": {"cache_gb": 1e-7},   # ~107 bytes: evicts constantly
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32"},
        "training": {"num_workers": 2},
    })
    src = HostDataSource(train_df, cfg)
    for _ in range(3):
        batch = src.gather(np.arange(len(train_df)))
        assert batch["image"].shape[0] == len(train_df)


def test_prefetch_iterator_abandon_unblocks_producer():
    # Regression (ADVICE r2): breaking out of a prefetched loop must not leave
    # the producer blocked on a full queue forever.
    import threading
    import time

    from fedvit_tpu.data.pipeline import prefetch_iterator

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 0
    it.close()   # consumer abandons
    time.sleep(0.5)
    n_after_close = len(produced)
    time.sleep(0.5)
    # producer stopped: no unbounded production after close
    assert len(produced) == n_after_close
    assert n_after_close < 1000


def test_prefetch_iterator_error_propagates():
    from fedvit_tpu.data.pipeline import prefetch_iterator

    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_device_data_source_matches_host_source():
    """DeviceDataSource (one upload + on-device gather, the train_fold
    default on TPU) serves byte-identical batches to its wrapped source,
    including the chunked-upload path and the ragged sequential tail."""
    import numpy as np
    from fedvit_tpu.data.pipeline import ArrayDataSource, DeviceDataSource
    from fedvit_tpu.data.synthetic import make_synthetic_dataset

    data = make_synthetic_dataset(n=37, image_size=24, seed=5)
    host = ArrayDataSource(data, pack_mask=True)
    DeviceDataSource.CHUNK, saved = 16, DeviceDataSource.CHUNK  # force chunks
    try:
        dev = DeviceDataSource(host)
    finally:
        DeviceDataSource.CHUNK = saved
    assert len(dev) == 37
    idx = np.array([0, 5, 36, 16, 15])
    hb, db = host.gather(idx), dev.gather(idx)
    for k in ("image", "label", "metadata"):
        np.testing.assert_array_equal(np.asarray(db[k]), hb[k])

    # epoch plan equivalence under the same RNG
    hb_batches = list(host.epoch_batches(8, np.random.default_rng(3), True))
    db_batches = list(dev.epoch_batches(8, np.random.default_rng(3), True))
    assert len(hb_batches) == len(db_batches)
    for h, d in zip(hb_batches, db_batches):
        np.testing.assert_array_equal(np.asarray(d["image"]), h["image"])

    # sequential: ragged tail (37 = 4*8 + 5) preserved
    seq = list(dev.sequential_batches(8))
    assert [len(np.asarray(b["label"])) for b in seq] == [8, 8, 8, 8, 5]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b["label"]) for b in seq]), host.labels)


def test_train_fold_with_device_resident_source(tmp_path):
    """train_fold runs end-to-end on a DeviceDataSource (padding of ragged
    eval batches happens on device via _pad_batch)."""
    import numpy as np
    from fedvit_tpu.core.config import from_dict
    from fedvit_tpu.data.pipeline import ArrayDataSource, DeviceDataSource
    from fedvit_tpu.data.synthetic import make_synthetic_dataset
    from fedvit_tpu.train.loop import train_fold

    cfg = from_dict({
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32", "drop_path_rate": 0.0},
        "data": {"use_segmentation_mask": False},
        "training": {"epochs": 1, "batch_size": 16,
                     "ema": {"enabled": False}, "tta": {"enabled": False}},
        "loss": {"type": "ce"}})
    tr = DeviceDataSource(ArrayDataSource(
        make_synthetic_dataset(n=48, image_size=40, seed=0)))
    va = DeviceDataSource(ArrayDataSource(
        make_synthetic_dataset(n=21, image_size=40, seed=1)))   # ragged
    te = DeviceDataSource(ArrayDataSource(
        make_synthetic_dataset(n=17, image_size=40, seed=2)))   # ragged
    res = train_fold(cfg, 0, tr, va, te, workdir=None, log=lambda s: None)
    assert res.logits.shape == (17, 8)
    assert np.isfinite(res.logits).all()
