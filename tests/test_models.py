"""Model zoo — Swin backbone, U-Net seg branch, fusion modules, full
seg-guided HybridViT-equivalent classifier (old gen), LLRD on Swin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.models import build_model
from fedvit_tpu.models.fusion import build_fusion_module
from fedvit_tpu.models.swin import (SwinTransformerV2, relative_position_index,
                                    shift_attention_mask, window_partition,
                                    window_unpartition)
from fedvit_tpu.models.unet import SegmentationBranch
from fedvit_tpu.train.optim import llrd_scale_tree


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_unpartition(w, 4, 8, 8)
    assert np.allclose(back, x)


def test_relative_position_index_symmetry():
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.max() < 49 and idx.min() >= 0
    assert (np.diag(idx) == idx[0, 0]).all()  # zero-offset index constant


def test_shift_mask_blocks_cross_region():
    mask = shift_attention_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask == -100).any()
    assert shift_attention_mask(8, 8, 4, 0) is None


@pytest.fixture(scope="module")
def swin_tiny():
    m = SwinTransformerV2(image_size=64, embed_dim=24, depths=(2, 2, 2),
                          num_heads=(2, 4, 8), window_size=8,
                          drop_path_rate=0.0, dtype=jnp.float32)
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    return m, v, x


def test_swin_forward_and_grads(swin_tiny):
    m, v, x = swin_tiny
    out = m.apply(v, x)
    assert out.shape == (2, 96)  # 24 * 2^(3-1)
    g = jax.grad(lambda p: (m.apply({"params": p}, x) ** 2).sum())(v["params"])
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))


def test_swin_shift_changes_output(swin_tiny):
    """Shifted-window blocks must actually mix across window boundaries:
    two inputs identical inside one window but different outside must give
    different pooled features."""
    m, v, x = swin_tiny
    x2 = x.at[:, 32:, 32:, :].set(0.0)
    o1 = m.apply(v, x)
    o2 = m.apply(v, x2)
    assert not np.allclose(o1, o2)


def test_swin_llrd_structure(swin_tiny):
    m, v, _ = swin_tiny
    scales = llrd_scale_tree({"backbone": v["params"]}, 0.75, 10.0)
    flat = traverse_util.flatten_dict(scales)
    # 3 stages → patch_embed at 0.75^4
    pe = [v for k, v in flat.items() if k[1] == "patch_embed"][0]
    assert np.isclose(float(pe), 0.75 ** 4)
    s0 = [v for k, v in flat.items() if k[1] == "layers_0"][0]
    assert np.isclose(float(s0), 0.75 ** 3)
    s2 = [v for k, v in flat.items() if k[1] == "layers_2"][0]
    assert np.isclose(float(s2), 0.75 ** 1)
    nrm = [v for k, v in flat.items() if k[1] == "norm"][0]
    assert float(nrm) == 1.0


def test_swin_registry_name():
    from fedvit_tpu.models.registry import build_backbone
    mod, dim = build_backbone(
        "swinv2_large_window12to24_192to384.ms_in22k_ft_in1k", 384)
    assert dim == 1536
    assert mod.window_size == 24
    assert mod.pretrained_window_sizes == (12, 12, 12, 6)


def test_segmentation_branch_shapes():
    branch = SegmentationBranch(encoder_channels=(8, 16, 32, 64),
                                decoder_channels=(32, 16, 8, 4))
    rng = jax.random.key(0)
    x = jnp.zeros((2, 64, 64, 3))
    v = branch.init({"params": rng}, x)
    mask, dec_feats, bottleneck = branch.apply(
        v, x, mutable=["batch_stats"])[0]
    assert mask.shape == (2, 64, 64, 1)
    assert bottleneck.shape == (2, 4, 4, 128)
    assert len(dec_feats) == 4
    assert dec_feats[-1].shape == (2, 64, 64, 4)


@pytest.mark.parametrize("ftype", ["attention", "concat", "cross_attention"])
def test_fusion_modules(ftype):
    fusion = build_fusion_module(ftype, transformer_dim=96, seg_channels=8,
                                 output_dim=96)
    rng = jax.random.key(0)
    trans = jnp.ones((2, 96))
    seg = jnp.ones((2, 16, 16, 8))
    v = fusion.init({"params": rng, "dropout": rng}, trans, seg)
    out = fusion.apply(v, trans, seg)
    assert out.shape == (2, 96)
    assert np.isfinite(np.asarray(out)).all()


def test_seg_guided_classifier_old_gen():
    """Full old-gen HybridViT equivalent: backbone + seg branch + fusion +
    learned metadata embedding + LN classifier head."""
    cfg = from_dict({
        "model": {
            "backbone": "vit_tiny_patch16_224", "image_size": 32,
            "compute_dtype": "float32", "drop_path_rate": 0.0,
            "metadata": {"enabled": True, "style": "embedding",
                         "embed_dim": 64},
            "classifier": {"layer_norm": True, "dropout": 0.3},
            "segmentation": {"enabled": True,
                             "encoder_channels": [8, 16, 32, 64],
                             "decoder_channels": [32, 16, 8, 4],
                             "fusion_type": "cross_attention"},
        },
        "data": {"use_segmentation_mask": False},
    })
    model = build_model(cfg)
    rng = jax.random.key(0)
    x = jnp.zeros((2, 32, 32, 3))
    meta_raw = {"age": jnp.array([0.5, 0.3]),
                "sex": jnp.array([0, 1]),
                "site": jnp.array([2, 8])}
    v = model.init({"params": rng, "dropout": rng}, x,
                   metadata_raw=meta_raw)
    out = model.apply(v, x, metadata_raw=meta_raw)
    assert out["logits"].shape == (2, 8)
    assert out["seg_mask"].shape == (2, 32, 32, 1)
    assert "features" in out
    # train mode (batch_stats from U-Net BN)
    out2, mut = model.apply(v, x, metadata_raw=meta_raw,
                            deterministic=False,
                            rngs={"dropout": rng}, mutable=["batch_stats"])
    assert "seg_branch" in mut["batch_stats"]


def test_expand_bias_table_matches_gather():
    """The Toeplitz slice/stack expansion must equal the reference
    table.reshape(-1, H)[relative_position_index(w)] gather formulation."""
    from fedvit_tpu.models.swin import expand_bias_table
    import numpy as np
    import jax.numpy as jnp
    for w in (2, 3, 8):
        h = 3
        rng = np.random.default_rng(w)
        table = jnp.asarray(rng.normal(size=(2 * w - 1, 2 * w - 1, h)),
                            jnp.float32)
        idx = relative_position_index(w)
        ref = np.asarray(table.reshape(-1, h))[idx.reshape(-1)].reshape(
            w * w, w * w, h).transpose(2, 0, 1)          # (H, w², w²)
        out = np.asarray(expand_bias_table(table, w))
        np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_patch_merging_conv_matches_dense(monkeypatch):
    """PatchMergingV2's two formulations — explicit space-to-depth (default)
    and the stride-2 conv (FEDVIT_MERGE_CONV=1, kept as a measured e2e
    negative, README round-5 lever 2) — must both equal the reference
    space-to-depth + Dense math, sharing the SAME flat (4c, 2c)
    `reduction/kernel` parameter (checkpoint/torch-import layout)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fedvit_tpu.models.swin import PatchMergingV2

    r = np.random.default_rng(7)
    x = jnp.asarray(r.normal(size=(3, 12, 8, 10)), jnp.float32)
    m = PatchMergingV2(dtype=jnp.float32)
    v = m.init(jax.random.key(0), x)
    assert v["params"]["reduction"]["kernel"].shape == (40, 20)
    monkeypatch.delenv("FEDVIT_MERGE_CONV", raising=False)
    out = m.apply(v, x)
    monkeypatch.setenv("FEDVIT_MERGE_CONV", "1")
    out_conv = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out),
                               rtol=0, atol=2e-5)

    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    pre = xr @ v["params"]["reduction"]["kernel"]
    mean = pre.mean(-1, keepdims=True)
    var = ((pre - mean) ** 2).mean(-1, keepdims=True)
    ref = ((pre - mean) / jnp.sqrt(var + 1e-5) * v["params"]["norm"]["scale"]
           + v["params"]["norm"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)
