"""Federated training on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.data.synthetic import make_synthetic_dataset
from fedvit_tpu.fed.partition import (client_weights, dirichlet_partition,
                                      iid_partition, partition,
                                      shard_partition)
from fedvit_tpu.fed.server import sample_client_batches, train_federated
from fedvit_tpu.models import build_model
from fedvit_tpu.parallel.mesh import client_mesh, make_mesh


def fed_cfg(num_clients=8, rounds=2, **model_over):
    return from_dict({
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32", "drop_path_rate": 0.0,
                  "metadata": {"enabled": True}, **model_over},
        "data": {"use_segmentation_mask": False},
        "training": {"batch_size": 8, "optimizer": {"lr": 3e-4},
                     "ema": {"enabled": True, "decay": 0.9},
                     "gradient_accumulation_steps": 1},
        "augmentation": {
            "train": {"rotation": 0,
                      "randaugment": {"enabled": False},
                      "color_jitter": {"brightness": 0, "contrast": 0,
                                       "saturation": 0, "hue": 0}},
            "mixup": {"enabled": False}, "cutmix": {"enabled": False}},
        "loss": {"type": "ce"},
        "federated": {"enabled": True, "num_clients": num_clients,
                      "rounds": rounds, "local_steps": 4,
                      "partition": "dirichlet", "dirichlet_alpha": 0.5},
    })


# ---------------------------------------------------------------------------
# Partitioners
# ---------------------------------------------------------------------------

def test_partitions_cover_everything():
    labels = np.random.default_rng(0).integers(0, 8, 500)
    for kind in ("iid", "dirichlet", "shards"):
        parts = partition(kind, labels, 5, seed=0)
        allidx = np.sort(np.concatenate(parts))
        assert (allidx == np.arange(500)).all(), kind


def test_dirichlet_skew_increases_with_small_alpha():
    labels = np.random.default_rng(0).integers(0, 8, 2000)

    def skew(alpha):
        parts = dirichlet_partition(labels, 4, alpha=alpha, seed=1)
        # mean within-client max-class share
        shares = []
        for p in parts:
            counts = np.bincount(labels[p], minlength=8)
            shares.append(counts.max() / counts.sum())
        return np.mean(shares)

    assert skew(0.1) > skew(100.0)


def test_client_weights_normalized():
    labels = np.random.default_rng(0).integers(0, 8, 100)
    parts = iid_partition(labels, 4, seed=0)
    w = client_weights(parts)
    assert abs(w.sum() - 1.0) < 1e-6


def test_sample_client_batches_shapes():
    data = make_synthetic_dataset(n=64, image_size=16, seed=0)
    parts = shard_partition(data["label"], 4, seed=0)
    rng = np.random.default_rng(0)
    b = sample_client_batches(data, parts[0], local_steps=3, batch_size=5,
                              rng=rng)
    assert b["image"].shape == (3, 5, 16, 16, 3)
    assert b["label"].shape == (3, 5)
    assert b["metadata"].shape == (3, 5, 13)
    # all sampled labels belong to the client's partition
    part_labels = set(data["label"][parts[0]].tolist())
    assert set(b["label"].reshape(-1).tolist()) <= part_labels


# ---------------------------------------------------------------------------
# End-to-end FedAvg on the 8-device mesh
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_clients", [8, 16])
def test_fedavg_round_runs_and_learns(num_clients):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = fed_cfg(num_clients=num_clients, rounds=3)
    model = build_model(cfg)
    rng = jax.random.key(0)
    import jax.numpy as jnp
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 13)))
    data = make_synthetic_dataset(n=256, image_size=32, seed=0)
    mesh = client_mesh()

    result = train_federated(cfg, model, variables, data, eval_data=None,
                             mesh=mesh, log_fn=lambda s: None)
    losses = [h["loss"] for h in result.history]
    assert len(losses) == 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"fed loss did not decrease: {losses}"


def test_fedavg_matches_single_device_semantics():
    """FedAvg over the mesh == FedAvg computed client-by-client on one device.

    Runs one round with 8 clients on the 8-device mesh, then re-runs the same
    round on a 1-device mesh (same client batches, same rng) and checks the
    aggregated parameters agree — the collective must not change the math."""
    cfg = fed_cfg(num_clients=8, rounds=1)
    model = build_model(cfg)
    import jax.numpy as jnp
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 13)))
    data = make_synthetic_dataset(n=256, image_size=32, seed=0)

    from fedvit_tpu.fed.fedavg import make_federated_round
    from fedvit_tpu.fed.partition import partition as make_parts
    from fedvit_tpu.train.losses import build_loss

    parts = make_parts("dirichlet", data["label"], 8, alpha=0.5, seed=42)
    w = client_weights(parts)
    host_rng = np.random.default_rng(0)
    per_client = [sample_client_batches(data, parts[c], 2, 8, host_rng)
                  for c in range(8)]
    stacked = {k: jnp.asarray(np.stack([pc[k] for pc in per_client]))
               for k in per_client[0]}
    loss_fn = build_loss(cfg)
    key = jax.random.key(7)

    mesh8 = client_mesh()
    round8 = make_federated_round(cfg, model.apply, loss_fn, mesh8, donate=False)
    p8, _, m8 = round8(variables["params"], variables["batch_stats"],
                       stacked, jnp.asarray(w), key)

    mesh1 = make_mesh([1], ["client"], jax.devices()[:1])
    round1 = make_federated_round(cfg, model.apply, loss_fn, mesh1, donate=False)
    p1, _, m1 = round1(variables["params"], variables["batch_stats"],
                       stacked, jnp.asarray(w), key)

    flat8 = jax.tree.leaves(p8)
    flat1 = jax.tree.leaves(p1)
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert abs(float(m8["loss"]) - float(m1["loss"])) < 1e-3


def test_hybrid_mesh_round_matches_client_only_mesh():
    """Multi-slice story (SURVEY §2.3): hybrid_mesh puts clients on the
    outer (DCN "slice") axis and data-parallel shards on the inner ICI
    axis. The collective layout must not change the math — a FedAvg round
    on the 2-slice x 4-chip hybrid mesh must agree with the same round on
    a plain 2-client mesh with unsharded local batches."""
    from fedvit_tpu.fed.fedavg import make_federated_round
    from fedvit_tpu.parallel.mesh import hybrid_mesh
    from fedvit_tpu.train.losses import build_loss
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    hmesh = hybrid_mesh(2, 4)
    assert hmesh.devices.shape == (2, 4)
    assert hmesh.axis_names == ("client", "data")
    # CPU/single-slice fallback: device order stands in for slice grouping
    assert list(hmesh.devices.flat) == jax.devices()[:8]

    # dropout + train-time augmentation draw per-SAMPLE randomness from a
    # per-SHARD key, and the metadata branch's BatchNorm normalizes with
    # per-shard batch statistics (non-sync-BN DDP semantics, by design) —
    # so sharded vs unsharded only agree with all three off. What this
    # test pins down is that the collective layout itself (pmean over
    # "data" inside each local step) does not change the math.
    cfg = fed_cfg(num_clients=2, rounds=1,
                  metadata={"enabled": False},
                  classifier={"dropout": 0.0})
    import dataclasses
    cfg = cfg.replace(
        federated=dataclasses.replace(cfg.federated, augment=False))
    model = build_model(cfg)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 13)))
    data = make_synthetic_dataset(n=128, image_size=32, seed=0)
    parts = partition("iid", data["label"], 2, seed=3)
    w = client_weights(parts)
    host_rng = np.random.default_rng(0)
    # ONE local step: the round's mean loss is then the pre-update forward
    # loss, which the sharded and unsharded programs must agree on tightly
    # (with >1 steps, later losses sit downstream of Adam's O(lr)
    # amplification of reduction-order noise and can differ by ~1e-2)
    per_client = [sample_client_batches(data, parts[c], 1, 8, host_rng)
                  for c in range(2)]
    stacked = {k: jnp.asarray(np.stack([pc[k] for pc in per_client]))
               for k in per_client[0]}
    loss_fn = build_loss(cfg)
    key = jax.random.key(7)

    def shard_for(mesh):
        return {
            k: jax.device_put(v, NamedSharding(
                mesh, P("client", None, "data",
                        *([None] * (v.ndim - 3))) if v.ndim >= 3
                else P("client")))
            for k, v in stacked.items()}

    round_h = make_federated_round(cfg, model.apply, loss_fn, hmesh, donate=False)
    ph, _, mh = round_h(variables["params"], variables.get("batch_stats", {}),
                        shard_for(hmesh), jnp.asarray(w), key)

    # (a) same logical 2-D mesh built directly — must be bit-identical
    # (hybrid_mesh only changes which physical device sits where)
    mesh_2d = make_mesh([2, 4], ["client", "data"], jax.devices()[:8])
    round_2d = make_federated_round(cfg, model.apply, loss_fn, mesh_2d, donate=False)
    p2, _, m2 = round_2d(variables["params"], variables.get("batch_stats", {}),
                         shard_for(mesh_2d), jnp.asarray(w), key)
    for a, b in zip(jax.tree.leaves(ph), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) vs a plain 2-client mesh with unsharded local batches. The
    # pre-update forward loss must agree tightly (a sum-vs-mean bug in the
    # "data"-axis pmean would show up as a ~4x mismatch here); params only
    # loosely — Adam's first steps amplify reduction-order float noise to
    # O(lr) sign flips, so exact param equality across different reduction
    # orders is not a meaningful contract.
    mesh_c = make_mesh([2], ["client"], jax.devices()[:2])
    round_c = make_federated_round(cfg, model.apply, loss_fn, mesh_c, donate=False)
    pc, _, mc = round_c(variables["params"], variables.get("batch_stats", {}),
                        stacked, jnp.asarray(w), key)
    assert abs(float(mh["loss"]) - float(mc["loss"])) < 1e-4 * (
        1 + abs(float(mc["loss"])))
    lr = cfg.training.optimizer.lr
    steps = stacked["image"].shape[1]
    for a, b in zip(jax.tree.leaves(ph), jax.tree.leaves(pc)):
        diff = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        assert diff <= 3 * lr * steps, f"param divergence {diff} > 3*lr*steps"


def test_fedavg_eval_pipeline_and_learning():
    """Regression for the round-1 eval bug: per-round eval must route inputs
    through make_device_augment(train=False) (eval geometry + normalization),
    matching what clients train on. With raw [0,1] inputs at eval time the
    model sees a distribution it never trained on and accuracy pins near
    chance (1/8); with the fix it climbs well above it. Also covers ragged
    eval tails (padded to one static shape) and uint8 eval images."""
    cfg = fed_cfg(num_clients=8, rounds=4)
    model = build_model(cfg)
    import jax.numpy as jnp
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 13)))
    data = make_synthetic_dataset(n=296, image_size=32, seed=0, noise=0.15)
    eval_data = {k: v[:40] for k, v in data.items()}      # 40 % 16 != 0
    eval_data["image"] = (eval_data["image"] * 255).astype(np.uint8)
    train_data = {k: v[40:] for k, v in data.items()}

    result = train_federated(cfg, model, variables, train_data,
                             eval_data=eval_data, mesh=client_mesh(),
                             log_fn=lambda s: None, eval_batch_size=16)
    assert len(result.history) == 4
    for h in result.history:
        for k in ("accuracy", "balanced_accuracy", "macro_f1"):
            assert k in h and np.isfinite(h[k])
    accs = [h["accuracy"] for h in result.history]
    assert accs[-1] > 0.25, f"eval accuracy stuck near chance: {accs}"
    assert max(accs) >= accs[0], f"accuracy never improved: {accs}"


def test_partial_participation():
    """clients_per_round < num_clients: each round samples a client subset;
    the client-axis width stays static."""
    cfg = fed_cfg(num_clients=16, rounds=3)
    import dataclasses
    cfg = cfg.replace(federated=dataclasses.replace(
        cfg.federated, clients_per_round=8))
    model = build_model(cfg)
    import jax.numpy as jnp
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 13)))
    data = make_synthetic_dataset(n=256, image_size=32, seed=0)
    logs = []
    result = train_federated(cfg, model, variables, data, eval_data=None,
                             mesh=client_mesh(), log_fn=logs.append)
    assert len(result.history) == 3
    assert all(np.isfinite(h["loss"]) for h in result.history)


def test_federated_checkpoint_resume_bit_identical(tmp_path):
    """SURVEY §5 'per-round federated server state' (VERDICT r2 missing #1):
    run 8 rounds uninterrupted; run 4 rounds checkpointing, rebuild from
    scratch, resume to 8 — the loss trajectory must continue IDENTICALLY
    (host sampling RNG + jax round keys are part of the checkpoint)."""
    import jax.numpy as jnp

    def build():
        cfg = fed_cfg(num_clients=8, rounds=8)
        model = build_model(cfg)
        rng = jax.random.key(0)
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 13)))
        return cfg, model, variables

    data = make_synthetic_dataset(n=256, image_size=32, seed=0, noise=0.15)
    eval_data = {k: v[:32] for k, v in data.items()}
    train_data = {k: v[32:] for k, v in data.items()}
    import dataclasses

    # uninterrupted 8-round run (no checkpointing)
    cfg, model, variables = build()
    full = train_federated(cfg, model, variables, train_data,
                           eval_data=eval_data, mesh=client_mesh(),
                           log_fn=lambda s: None, eval_batch_size=16)

    # 4 rounds with checkpointing…
    cfg, model, variables = build()
    cfg4 = cfg.replace(federated=dataclasses.replace(cfg.federated, rounds=4))
    wd = str(tmp_path / "fedckpt")
    train_federated(cfg4, model, variables, train_data, eval_data=eval_data,
                    mesh=client_mesh(), log_fn=lambda s: None,
                    eval_batch_size=16, workdir=wd)

    # …then a FRESH process-equivalent resume to 8
    cfg, model, variables = build()
    resumed = train_federated(cfg, model, variables, train_data,
                              eval_data=eval_data, mesh=client_mesh(),
                              log_fn=lambda s: None, eval_batch_size=16,
                              workdir=wd, resume=True)

    assert len(resumed.history) == 8
    full_losses = [h["loss"] for h in full.history]
    res_losses = [h["loss"] for h in resumed.history]
    np.testing.assert_allclose(res_losses, full_losses, rtol=1e-5,
                               err_msg="resumed trajectory diverged")
    full_acc = [h["accuracy"] for h in full.history]
    res_acc = [h["accuracy"] for h in resumed.history]
    np.testing.assert_allclose(res_acc, full_acc, rtol=1e-5)
    # final params identical too
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


from pathlib import Path


def test_federated_checkpoint_atomic_crash_windows(tmp_path):
    """The directory-swap save must leave a loadable checkpoint in every
    crash window: mid-tmp-write (stale tmp ignored), between the two
    renames (fed_ckpt.old fallback), and after promotion (live wins)."""
    import shutil
    import jax
    import jax.numpy as jnp
    from fedvit_tpu.train import checkpoint as ckpt

    params = {"w": np.ones((4, 4), np.float32)}
    bstats = {}
    key = jax.random.key(7)
    rng = np.random.default_rng(3)
    base = str(tmp_path / "wd")

    def save(rnd):
        p = jax.tree.map(lambda a: a + rnd, params)
        ckpt.save_federated_checkpoint(base, p, bstats, None, rnd,
                                       [{"round": rnd}],
                                       rng.bit_generator.state, key)

    save(1)
    assert ckpt.federated_checkpoint_exists(base)

    # window A: crash mid-save of round 2 — a half-written tmp dir exists;
    # the live round-1 generation must still load
    tmp = Path(base) / "fed_ckpt.tmp"
    tmp.mkdir()
    (tmp / "fed_meta.json").write_text("{corrupt")
    got = ckpt.load_federated_checkpoint(base, params, bstats, None)
    assert got["round"] == 1
    shutil.rmtree(tmp)

    # window B: crash between the two renames — live dir gone, .old holds
    # round 1; exists() and load() must fall back to it
    live, old = Path(base) / "fed_ckpt", Path(base) / "fed_ckpt.old"
    live.rename(old)
    assert ckpt.federated_checkpoint_exists(base)
    got = ckpt.load_federated_checkpoint(base, params, bstats, None)
    assert got["round"] == 1 and got["history"] == [{"round": 1}]
    old.rename(live)   # restore

    # window C: a later save promotes atomically over the previous one and
    # clears both transient generations
    save(2)
    got = ckpt.load_federated_checkpoint(base, params, bstats, None)
    assert got["round"] == 2
    np.testing.assert_allclose(got["params"]["w"], params["w"] + 2)
    assert not (Path(base) / "fed_ckpt.tmp").exists()
    assert not (Path(base) / "fed_ckpt.old").exists()


def test_class_weights_reach_the_federated_loss(monkeypatch):
    """`loss.class_weights: true` must hand balanced weights (computed from
    the server's global train labels) to build_loss — this silently no-op'd
    before round 5 (build_loss was called without its weights argument)."""
    import dataclasses
    import jax.numpy as jnp
    import fedvit_tpu.fed.server as server_mod
    from fedvit_tpu.data.sampling import compute_class_weights

    cfg = fed_cfg(num_clients=8, rounds=1)
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, class_weights=True))
    model = build_model(cfg)
    rng = jax.random.key(0)
    import jax.numpy as jnp2
    variables = model.init({"params": rng, "dropout": rng},
                           jnp2.zeros((2, 32, 32, 3)), jnp2.zeros((2, 13)))
    data = make_synthetic_dataset(n=256, image_size=32, seed=0)

    captured = {}
    real = server_mod.build_loss

    def spy(c, class_weights=None):
        captured["w"] = class_weights
        return real(c, class_weights)

    monkeypatch.setattr(server_mod, "build_loss", spy)
    train_federated(cfg, model, variables, data, eval_data=None,
                    mesh=client_mesh(), log_fn=lambda s: None)
    assert captured["w"] is not None, "weights never reached build_loss"
    expect = compute_class_weights(np.asarray(data["label"]),
                                   cfg.num_classes)
    np.testing.assert_allclose(np.asarray(captured["w"]), expect, rtol=1e-6)
