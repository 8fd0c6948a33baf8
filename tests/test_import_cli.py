"""File-level pretrained import — the reference's `pretrained: true`
production path (/root/reference/config.yaml:31, model.py:112-166) as a
deployable flow: torch weights FILE on disk → cli.import_weights → orbax
checkpoint → model.pretrained_path → train_fold starts from it, with fp32
logits parity against the torch model the file came from."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import yaml

sys.path.insert(0, str(Path(__file__).parent))
from reference_oracle import load_reference  # noqa: E402

from fedvit_tpu.core.config import from_dict  # noqa: E402
from fedvit_tpu.models import build_model  # noqa: E402
from fedvit_tpu.train import checkpoint as ckpt  # noqa: E402

SIZE = 64


def _raw_cfg(use_mask: bool, pretrained_path: str = ""):
    return {
        "model": {"backbone": f"vit_tiny_patch16_{SIZE}", "image_size": SIZE,
                  "compute_dtype": "float32", "drop_path_rate": 0.0,
                  "pretrained": True, "pretrained_path": pretrained_path,
                  "metadata": {"enabled": True, "dropout": 0.0},
                  "classifier": {"dropout": 0.0}},
        "data": {"use_segmentation_mask": use_mask,
                 "on_device_masks": False},
        "training": {"epochs": 0, "batch_size": 8,
                     "gradient_accumulation_steps": 1,
                     "ema": {"enabled": False},
                     "tta": {"enabled": False},
                     "early_stopping": {"patience": 5}},
        "augmentation": {"mixup": {"enabled": False},
                         "cutmix": {"enabled": False}},
        "loss": {"type": "ce"},
    }


def _torch_classifier(in_channels: int, seed: int = 0):
    """The ACTUAL reference ISICClassifier (via the timm shim)."""
    ref = load_reference()
    torch.manual_seed(seed)
    tm = ref.model.ISICClassifier(
        backbone_name=f"vit_tiny_patch16_{SIZE}", num_classes=8,
        image_size=SIZE, in_channels=in_channels, pretrained=False,
        drop_path_rate=0.0, metadata_enabled=True,
        meta_dropout=0.0, cls_dropout=0.0)
    return tm.float().eval()


def _run_cli(tmp_path, sd, raw_cfg):
    """torch.save a state dict, run the import CLI, return checkpoint dir."""
    from fedvit_tpu.cli.import_weights import main as import_main
    weights = tmp_path / "weights.pt"
    torch.save(sd, weights)
    cfg_file = tmp_path / "config.yaml"
    cfg_file.write_text(yaml.safe_dump(raw_cfg))
    out = tmp_path / "converted"
    assert import_main(["--weights", str(weights), "--config", str(cfg_file),
                        "--output", str(out)]) == 0
    assert ckpt.pretrained_exists(str(out))
    return out


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    """Full-classifier state dict converted once for the module."""
    tmp = tmp_path_factory.mktemp("imp")
    tm = _torch_classifier(in_channels=3)
    out = _run_cli(tmp, tm.state_dict(), _raw_cfg(use_mask=False))
    return tm, out


def test_cli_full_classifier_fp32_parity(converted):
    """CLI-converted checkpoint loads back into a fresh model and reproduces
    the torch model's logits at fp32."""
    tm, out = converted
    cfg = from_dict(_raw_cfg(use_mask=False))
    model = build_model(cfg)
    rng = jax.random.key(123)       # seed unrelated to the conversion's
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
                           jnp.zeros((1, 13), jnp.float32))
    variables = ckpt.load_pretrained(str(out), dict(variables), cfg)

    rng_np = np.random.default_rng(7)
    x = rng_np.normal(size=(4, SIZE, SIZE, 3)).astype(np.float32)
    md = rng_np.uniform(size=(4, 13)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                 metadata=torch.from_numpy(md))["logits"].numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(md),
                                  deterministic=True)["logits"])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_train_fold_starts_from_pretrained(converted, tmp_path):
    """train_fold with model.pretrained_path starts from the converted
    weights: its test logits match the torch model run on the identically
    eval-transformed inputs (epochs=0 isolates initialization)."""
    tm, out = converted
    cfg = from_dict(_raw_cfg(use_mask=False, pretrained_path=str(out)))

    from fedvit_tpu.data.pipeline import ArrayDataSource, make_device_augment
    from fedvit_tpu.data.synthetic import make_synthetic_dataset
    from fedvit_tpu.train.loop import train_fold
    train = ArrayDataSource(make_synthetic_dataset(n=32, image_size=SIZE,
                                                   seed=0))
    val = ArrayDataSource(make_synthetic_dataset(n=16, image_size=SIZE,
                                                 seed=1))
    test = ArrayDataSource(make_synthetic_dataset(n=16, image_size=SIZE,
                                                  seed=2))
    logs = []
    res = train_fold(cfg, 0, train, val, test, workdir=None, log=logs.append)
    assert any("Pretrained init" in l for l in logs)

    # torch model on the SAME eval-transformed batches
    augment_eval = jax.jit(make_device_augment(cfg, train=False))
    ref_logits = []
    for batch in test.sequential_batches(cfg.training.batch_size):
        jb = augment_eval({k: jnp.asarray(v) for k, v in batch.items()},
                          jax.random.key(0))
        with torch.no_grad():
            ref_logits.append(tm(
                torch.from_numpy(np.array(jb["image"])).permute(0, 3, 1, 2),
                metadata=torch.from_numpy(np.array(jb["metadata"]))
            )["logits"].numpy())
    np.testing.assert_allclose(res.logits, np.concatenate(ref_logits),
                               rtol=1e-4, atol=1e-4)


def test_cli_backbone_only_4ch_expansion_and_pos_resample(tmp_path):
    """A bare timm BACKBONE checkpoint (3-channel, different image size)
    converts for a 4-channel masked config: patch-embed widened with the
    RGB-mean rule (reference model.py:150-166) and pos-embed bicubically
    resampled to the target grid; head/metadata keep fresh init."""
    load_reference()           # installs the timm shim into sys.modules
    import timm
    torch.manual_seed(1)
    # shim timm backbone at 32px (2x2 grid); target config is 64px (4x4)
    tm = timm.create_model("vit_tiny_patch16_32", num_classes=0)
    sd = dict(tm.state_dict())

    out = _run_cli(tmp_path, sd, _raw_cfg(use_mask=True))
    cfg = from_dict(_raw_cfg(use_mask=True))
    model = build_model(cfg)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, SIZE, SIZE, 4), jnp.float32),
                           jnp.zeros((1, 13), jnp.float32))
    loaded = ckpt.load_pretrained(str(out), dict(variables), cfg)

    w = np.asarray(
        loaded["params"]["backbone"]["patch_embed"]["proj"]["kernel"])
    assert w.shape[0] == 16 * 16 * 4
    src = sd["patch_embed.proj.weight"].numpy()          # (D, 3, 16, 16)
    src_rows = src.transpose(2, 3, 1, 0).reshape(256, 3, -1)
    got = w.reshape(256, 4, -1)
    np.testing.assert_allclose(got[:, :3], src_rows, atol=1e-6)
    np.testing.assert_allclose(got[:, 3], src_rows.mean(axis=1), atol=1e-6)
    pos = np.asarray(loaded["params"]["backbone"]["pos_embed"])
    assert pos.shape == (1, 1 + 16, src.shape[0])        # 4x4 grid + cls
    # cls token position embedding passes through the resample untouched
    np.testing.assert_allclose(pos[:, 0], sd["pos_embed"].numpy()[:, 0],
                               atol=1e-6)


def test_load_pretrained_refuses_config_mismatch(converted):
    _, out = converted
    raw = _raw_cfg(use_mask=True)            # converted with use_mask=False
    cfg = from_dict(raw)
    model = build_model(cfg)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, SIZE, SIZE, 4), jnp.float32),
                           jnp.zeros((1, 13), jnp.float32))
    with pytest.raises(ValueError, match="in_channels"):
        ckpt.load_pretrained(str(out), dict(variables), cfg)
