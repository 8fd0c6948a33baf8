"""tools/parity_isic.py — the packaged north-star parity run (BASELINE.md:
per-round AUROC within ±0.005 of the reference pipeline) must execute
end-to-end on the synthetic fixture and pass its own bar.

The underlying math parity is covered by tests/test_reference_parity.py;
these tests cover the PACKAGING: the tool runs the real reference modules
side-by-side with ours, starts both sides from the same weights (fresh or a
--weights file), and returns exit code 0 with a truthful JSON summary.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).parent))

import parity_isic  # noqa: E402


def _run(capsys, argv):
    rc = parity_isic.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_parity_tool_synthetic_passes(capsys):
    rc, summary = _run(capsys, [
        "--synthetic", "--rounds", "1", "--n_train", "64", "--n_val", "32",
        "--batch_size", "16"])
    assert rc == 0
    assert summary["pass"] is True
    assert summary["value"] <= summary["bar"] == 0.005
    assert len(summary["rounds"]) == 1
    assert summary["pre_training_logit_gap"] < 1e-4


def test_parity_tool_starts_from_weights_file(tmp_path, capsys):
    """--weights: both sides start from the SAME torch checkpoint file —
    the deployment path a real parity run uses (reference weights exported
    once, compared on any host)."""
    from reference_oracle import load_reference
    ref = load_reference()
    torch.manual_seed(3)
    tm = ref.model.ISICClassifier(
        backbone_name="vit_tiny_patch16_64", num_classes=8, image_size=64,
        in_channels=3, pretrained=False, drop_path_rate=0.0,
        metadata_enabled=True, meta_dropout=0.0, cls_dropout=0.0)
    # distinctive weights so a silent fallback to fresh init would show as a
    # pre-training logit gap
    with torch.no_grad():
        tm.classifier[3].bias.add_(torch.linspace(-2, 2, 8))
    path = tmp_path / "ref_weights.pt"
    torch.save(tm.state_dict(), str(path))

    rc, summary = _run(capsys, [
        "--synthetic", "--rounds", "1", "--n_train", "48", "--n_val", "32",
        "--batch_size", "16", "--weights", str(path)])
    assert rc == 0
    assert summary["pass"] is True
    assert summary["pre_training_logit_gap"] < 1e-4


def test_parity_tool_fails_loudly_on_import_mismatch(monkeypatch, capsys):
    """A weight importer that stops reproducing the reference model must be
    a FATAL error (exit 2), never a silently-diverging comparison."""
    import fedvit_tpu.models.import_weights as iw
    real = iw.import_torch_isic

    def corrupted(sd, variables, depth):
        out = real(sd, variables, depth)
        import jax.numpy as jnp
        p = dict(out["params"])
        cls = dict(p["classifier"])
        fc2 = dict(cls["fc2"])
        fc2["bias"] = jnp.asarray(np.asarray(fc2["bias"]) + 1.0)
        cls["fc2"] = fc2
        p["classifier"] = cls
        return {"params": p, "batch_stats": out["batch_stats"]}

    monkeypatch.setattr(parity_isic, "import_torch_isic", corrupted,
                        raising=False)
    monkeypatch.setattr(iw, "import_torch_isic", corrupted)
    rc = parity_isic.main([
        "--synthetic", "--rounds", "1", "--n_train", "32", "--n_val", "32",
        "--batch_size", "16"])
    capsys.readouterr()
    assert rc == 2
