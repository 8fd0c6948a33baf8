"""Training engine — LLRD structure, optimizer wiring, and an end-to-end
"loss goes down / accuracy goes up" run on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.data.synthetic import batch_iterator, make_synthetic_dataset
from fedvit_tpu.models import build_model
from fedvit_tpu.train.losses import build_loss
from fedvit_tpu.train.optim import (build_head_optimizer, build_optimizer,
                                    head_only_mask, llrd_scale_tree)
from fedvit_tpu.train.state import TrainState
from fedvit_tpu.train.step import make_eval_step, make_train_step


def tiny_cfg(**over):
    base = {
        "model": {
            "backbone": "vit_tiny_patch16_224",
            "image_size": 32,
            "compute_dtype": "float32",
            "drop_path_rate": 0.0,
            "metadata": {"enabled": True},
        },
        "data": {"use_segmentation_mask": False},
        "training": {
            "epochs": 10,
            "batch_size": 16,
            "gradient_accumulation_steps": 2,
            "optimizer": {"lr": 3e-4},
            "scheduler": {"warmup_epochs": 1},
            "llrd": {"enabled": True, "decay_rate": 0.75},
            "ema": {"enabled": True, "decay": 0.99},
        },
        "augmentation": {"mixup": {"enabled": False},
                         "cutmix": {"enabled": False}},
        "loss": {"type": "ce"},
    }
    def deep_update(d, u):
        for k, v in u.items():
            d[k] = deep_update(d.get(k, {}), v) if isinstance(v, dict) else v
        return d
    return from_dict(deep_update(base, over))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = build_model(cfg)
    rng = jax.random.key(0)
    x = jnp.zeros((2, 32, 32, 3))
    meta = jnp.zeros((2, 13))
    variables = model.init({"params": rng, "dropout": rng}, x, meta)
    return cfg, model, variables


def test_llrd_scale_structure(setup):
    cfg, model, variables = setup
    scales = llrd_scale_tree(variables["params"], decay=0.75, head_mult=10.0)
    flat = traverse_util.flatten_dict(scales)
    # ViT-tiny: 12 blocks → patch_embed at 0.75^13
    pe = flat[("backbone", "patch_embed", "proj", "kernel")]
    assert np.isclose(float(pe), 0.75 ** 13)
    assert np.isclose(float(flat[("backbone", "cls_token")]), 0.75 ** 13)
    b0 = flat[("backbone", "blocks_0", "attn", "qkv", "kernel")]
    assert np.isclose(float(b0), 0.75 ** 12)
    b11 = flat[("backbone", "blocks_11", "attn", "qkv", "kernel")]
    assert np.isclose(float(b11), 0.75 ** 1)
    assert float(flat[("backbone", "norm", "scale")]) == 1.0
    assert float(flat[("classifier", "fc1", "kernel")]) == 10.0
    assert float(flat[("metadata_branch", "fc1", "kernel")]) == 10.0


def test_auto_batch_size_probe(setup):
    """The probe (reference utils.py:325-350) runs forwards at growing sizes
    and returns the largest that fits; on CPU everything fits → limit."""
    cfg, model, variables = setup
    from fedvit_tpu.train.probe import auto_batch_size
    bs = auto_batch_size(cfg, model=model, variables=variables,
                         start=4, step=4, limit=12, log=lambda s: None)
    assert bs == 12


def test_llrd_disabled_keeps_head_multiplier(setup):
    """llrd.enabled=False must still give the head its 10x LR: the reference
    always builds LLRD groups (head at 10x base LR) and only sets
    decay_rate=1.0 when LLRD is off (reference train.py:255-262,
    model.py:264-268)."""
    cfg, model, variables = setup
    cfg2 = tiny_cfg(training={"llrd": {"enabled": False},
                              "scheduler": {"warmup_epochs": 0}})
    tx, _ = build_optimizer(cfg2, variables["params"], steps_per_epoch=8)
    params = jax.tree.map(jnp.zeros_like, variables["params"])
    grads = jax.tree.map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, tx.init(params), params)
    flat = traverse_util.flatten_dict(updates)
    head = float(jnp.abs(flat[("classifier", "fc1", "kernel")]).mean())
    b0 = float(jnp.abs(flat[("backbone", "blocks_0", "attn", "qkv",
                             "kernel")]).mean())
    b11 = float(jnp.abs(flat[("backbone", "blocks_11", "attn", "qkv",
                              "kernel")]).mean())
    assert np.isclose(b0, b11, rtol=1e-5)      # decay_rate 1.0: flat backbone
    assert np.isclose(head / b0, 10.0, rtol=1e-4)


def test_llrd_patch_norm_lowest_scale():
    """Swin's patch_norm (the patch-embed LayerNorm, a sibling of patch_embed
    in our tree) takes the lowest LLRD scale like the reference, where it
    lives inside backbone.patch_embed (reference model.py:249-252)."""
    params = {"backbone": {
        "patch_embed": {"kernel": jnp.ones(1)},
        "patch_norm": {"scale": jnp.ones(1)},
        "layers_0": {"w": jnp.ones(1)},
        "layers_1": {"w": jnp.ones(1)},
        "norm": {"scale": jnp.ones(1)},
    }, "classifier": {"kernel": jnp.ones(1)}}
    flat = traverse_util.flatten_dict(llrd_scale_tree(params, 0.75, 10.0))
    assert np.isclose(float(flat[("backbone", "patch_norm", "scale")]),
                      0.75 ** 3)
    assert np.isclose(float(flat[("backbone", "patch_embed", "kernel")]),
                      0.75 ** 3)
    assert float(flat[("backbone", "norm", "scale")]) == 1.0


def test_head_only_mask(setup):
    cfg, model, variables = setup
    mask = traverse_util.flatten_dict(head_only_mask(variables["params"]))
    assert not mask[("backbone", "cls_token")]
    assert mask[("classifier", "fc1", "kernel")]


def test_head_optimizer_freezes_backbone(setup):
    cfg, model, variables = setup
    tx = build_head_optimizer(cfg, variables["params"], lr=1e-3)
    opt_state = tx.init(variables["params"])
    grads = jax.tree.map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    flat = traverse_util.flatten_dict(updates)
    assert np.allclose(flat[("backbone", "cls_token")], 0.0)
    assert not np.allclose(flat[("classifier", "fc1", "kernel")], 0.0)


def test_train_step_runs_and_learns(setup):
    cfg, model, variables = setup
    data = make_synthetic_dataset(n=128, image_size=32, seed=0)
    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=8)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(1), ema_enabled=True)
    train_step = make_train_step(cfg, loss_fn, donate=False)

    losses = []
    it = batch_iterator(data, 16, seed=0)
    for i in range(40):
        batch = {k: jnp.array(v) for k, v in next(it).items()}
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))

    assert int(state.step) == 40
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.8, f"loss did not decrease: {first} → {last}"

    # eval with EMA params: accuracy above chance on train data
    eval_step = make_eval_step(model.apply, cfg, loss_fn)
    batch = {k: jnp.array(v[:64]) for k, v in data.items() if k != "mask"}
    logits, _ = eval_step(state.eval_params(), state.batch_stats, batch)
    acc = float((np.argmax(np.asarray(logits), 1) == data["label"][:64]).mean())
    assert acc > 0.25, f"accuracy {acc} not above chance"


def test_train_step_donated_path_matches(setup):
    """Buffer donation (default-on off-axon, step.default_donate) must
    produce the identical trajectory as the non-donated step — and the
    donated path must actually run, so it can't rot while benches stay on
    axon (VERDICT r2 weak #4)."""
    cfg, model, variables = setup
    data = make_synthetic_dataset(n=32, image_size=32, seed=3)
    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=2)

    def run(donate):
        # donation CONSUMES the state's buffers — each run needs its own
        # copy or the first donated step would delete the shared fixture's
        # params out from under every later test
        state = TrainState.create(
            model.apply, jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables["batch_stats"]), tx,
            jax.random.key(4), ema_enabled=True)
        step = make_train_step(cfg, loss_fn, donate=donate)
        it = batch_iterator(data, 16, seed=3)
        losses = []
        for _ in range(3):
            batch = {k: jnp.array(v) for k, v in next(it).items()}
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        return losses, state

    losses_d, state_d = run(True)
    losses_n, state_n = run(False)
    np.testing.assert_allclose(losses_d, losses_n, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_d.params),
                    jax.tree.leaves(state_n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_default_donate_env_override(monkeypatch):
    from fedvit_tpu.train.step import default_donate
    monkeypatch.setenv("FEDVIT_DONATE", "1")
    assert default_donate() is True
    monkeypatch.setenv("FEDVIT_DONATE", "0")
    assert default_donate() is False
    monkeypatch.delenv("FEDVIT_DONATE")
    # auto: donate everywhere except the axon tunnel backend
    assert default_donate() is (jax.default_backend() != "axon")


def test_train_step_with_mixup(setup):
    cfg, model, variables = setup
    cfg_mix = tiny_cfg(augmentation={
        "mixup": {"enabled": True, "alpha": 0.4},
        "cutmix": {"enabled": True, "alpha": 1.0, "prob": 0.5}})
    data = make_synthetic_dataset(n=32, image_size=32, seed=1)
    loss_fn = build_loss(cfg_mix)
    tx, _ = build_optimizer(cfg_mix, variables["params"], steps_per_epoch=2)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2), ema_enabled=False)
    train_step = make_train_step(cfg_mix, loss_fn, donate=False)
    it = batch_iterator(data, 16, seed=1)
    for _ in range(3):
        batch = {k: jnp.array(v) for k, v in next(it).items()}
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    assert state.ema_params is None


def test_ema_params_track_but_lag(setup):
    cfg, model, variables = setup
    data = make_synthetic_dataset(n=32, image_size=32, seed=2)
    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=2)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(3), ema_enabled=True)
    train_step = make_train_step(cfg, loss_fn, donate=False)
    it = batch_iterator(data, 16, seed=2)
    p0 = jax.tree.leaves(state.params)[0].copy()
    for _ in range(3):
        batch = {k: jnp.array(v) for k, v in next(it).items()}
        state, _ = train_step(state, batch)
    p_now = jax.tree.leaves(state.params)[0]
    e_now = jax.tree.leaves(state.ema_params)[0]
    # EMA differs from both init and current params, and lags behind current
    assert not np.allclose(e_now, p_now)
    d_ema = float(jnp.abs(e_now - p0).mean())
    d_par = float(jnp.abs(p_now - p0).mean())
    assert 0 < d_ema < d_par


def test_joint_seg_loss_wired():
    """Old-gen JointLoss (`loss.seg_weight` > 0 + seg branch): the train
    step must supervise the seg branch against the batch's 4th (mask)
    channel, and the model must NOT consume that channel as input
    (reference old-gen HybridViT: 3-ch input, mask is a target).
    `loss.seg_weight` silently no-op'd before round 5."""
    cfg = tiny_cfg(
        model={"segmentation": {"enabled": True,
                                "encoder_channels": [8, 16],
                                "decoder_channels": [16, 8]}},
        data={"use_segmentation_mask": True},
        loss={"type": "ce", "seg_weight": 0.3},
        augmentation={"mixup": {"enabled": False},
                      "cutmix": {"enabled": False}},
    )
    model = build_model(cfg)
    assert model.mask_as_target and model.in_channels == 3
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 32, 32, 4)), jnp.zeros((2, 13)))
    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=4)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx, jax.random.key(1))
    train_step = make_train_step(cfg, loss_fn, donate=False)

    r = np.random.default_rng(0)
    img3 = r.uniform(-1, 1, size=(8, 32, 32, 3)).astype(np.float32)
    labels = jnp.asarray(r.integers(0, 8, size=(8,)), jnp.int32)
    meta = jnp.asarray(r.uniform(size=(8, 13)), jnp.float32)

    def run(mask01):
        m = np.full((8, 32, 32, 1), mask01, np.float32) * 2.0 - 1.0  # norm'd
        batch = {"image": jnp.asarray(np.concatenate([img3, m], -1)),
                 "label": labels, "metadata": meta}
        _, metrics = train_step(state, batch)
        return float(metrics["loss"])

    l0, l1 = run(0.0), run(1.0)
    assert np.isfinite(l0) and np.isfinite(l1)
    # the seg term reads the target channel → different targets, different loss
    assert abs(l0 - l1) > 1e-4, f"seg target ignored: {l0} vs {l1}"

    # the model itself is blind to the 4th channel (mask_as_target strips it)
    x0 = jnp.asarray(np.concatenate([img3, np.zeros((8, 32, 32, 1),
                                                    np.float32)], -1))
    x1 = jnp.asarray(np.concatenate([img3, np.ones((8, 32, 32, 1),
                                                   np.float32)], -1))
    out0 = model.apply(variables, x0, meta, deterministic=True)
    out1 = model.apply(variables, x1, meta, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out0["logits"]),
                                  np.asarray(out1["logits"]))
