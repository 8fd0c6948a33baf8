"""FedAvg over a TPU mesh — clients on a mesh axis, aggregation over ICI.

This is the idiomatic-TPU generalization of the reference's single-client
training loop (SURVEY.md §2.3, §7; driver north star: "FedAvg weight
aggregation expressed as jax.lax.pmean over ICI rather than host-side tensor
averaging"):

  * clients are the leading axis of stacked batch arrays, sharded over the
    mesh "client" axis (`shard_map`)
  * each device runs its clients' local SGD steps (a `lax.scan` over steps,
    `vmap` over the clients it hosts) — no host round-trips inside a round
  * FedAvg = weighted `lax.psum` of client parameters over the client axis —
    one XLA collective riding ICI
  * server update: θ ← θ + η_server · (Σ wᵢθᵢ − θ)  (η_server = 1 ⇒ plain FedAvg)

One federated round is ONE compiled XLA program.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from fedvit_tpu.core.config import Config
from fedvit_tpu.train.losses import LossFn, mixup_criterion
from fedvit_tpu.train.mixup import make_mix_fn


def build_local_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Per-client optimizer, re-initialized fresh each round (standard
    FedAvg). Plain AdamW + clip at the configured client LR."""
    opt = cfg.training.optimizer
    chain = []
    if cfg.training.grad_clip and cfg.training.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.training.grad_clip))
    chain.append(optax.scale_by_adam(b1=opt.b1, b2=opt.b2, eps=opt.eps))
    if opt.weight_decay:
        chain.append(optax.add_decayed_weights(opt.weight_decay))
    chain.append(optax.scale(-opt.lr))
    return optax.chain(*chain)


def make_local_train(cfg: Config, apply_fn: Callable, loss_fn: LossFn,
                     local_tx: optax.GradientTransformation,
                     data_axis: str = None) -> Callable:
    """One client's local training for a round.

    (params, batch_stats, batches{(S,B,...)}, rng) →
        (params', batch_stats', mean_loss)

    Each local step runs the on-device augmentation pipeline
    (data/pipeline.make_device_augment): the reference's train transform +
    normalization when federated.augment, else the eval transform — clients
    always see the same input distribution as the fold trainer.

    With `data_axis` set (2-D client×data mesh) each local batch arrives
    sharded over that axis: per-shard grads / batch-stats / loss are pmean'd
    over ICI every local step, so client params stay replicated along the
    data axis. (MixUp then pairs samples within a shard — distributionally
    equivalent; batch-stats are the mean of shard stats, sync-BN style.)"""
    from fedvit_tpu.data.pipeline import make_device_augment
    mix_fn = make_mix_fn(cfg.augmentation)
    use_meta = cfg.model.metadata.enabled
    augment_fn = make_device_augment(cfg, train=cfg.federated.augment)

    def loss_and_stats(params, bstats, images, labels, metadata, rng):
        rng_aug, rng_mix, rng_drop = jax.random.split(rng, 3)
        aug = augment_fn({"image": images, "label": labels,
                          "metadata": metadata}, rng_aug)
        images = aug["image"]
        if mix_fn is not None:
            images, la, lb, lam = mix_fn(rng_mix, images, labels)
        out, mutated = apply_fn(
            {"params": params, "batch_stats": bstats},
            images, metadata if use_meta else None,
            deterministic=False, rngs={"dropout": rng_drop},
            mutable=["batch_stats"])
        logits = out["logits"]
        if mix_fn is not None:
            loss = mixup_criterion(loss_fn, logits, la, lb, lam)
        else:
            loss = loss_fn(logits, labels)
        return loss, mutated.get("batch_stats", bstats)

    grad_fn = jax.value_and_grad(loss_and_stats, has_aux=True)

    def local_train(params, bstats, batches: Dict[str, jnp.ndarray], rng):
        num_steps = batches["image"].shape[0]
        opt_state = local_tx.init(params)
        step_rngs = jax.random.split(rng, num_steps)

        def body(carry, xs):
            params, bstats, opt_state = carry
            imgs, labels, meta, step_rng = xs
            (loss, new_bstats), grads = grad_fn(
                params, bstats, imgs, labels, meta, step_rng)
            if data_axis is not None:
                grads = jax.lax.pmean(grads, data_axis)
                new_bstats = jax.lax.pmean(new_bstats, data_axis)
                loss = jax.lax.pmean(loss, data_axis)
            updates, opt_state = local_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bstats, opt_state), loss

        meta = batches.get("metadata")
        if meta is None:
            meta = jnp.zeros(batches["image"].shape[:2] + (0,),
                             batches["image"].dtype)
        (params, bstats, _), losses = jax.lax.scan(
            body, (params, bstats, opt_state),
            (batches["image"], batches["label"], meta, step_rngs))
        return params, bstats, losses.mean()

    return local_train


def make_federated_round(cfg: Config, apply_fn: Callable, loss_fn: LossFn,
                         mesh: Mesh, donate: bool = True) -> Callable:
    """Build the jitted FedAvg round.

    `donate=True` (default) donates the incoming global params/bstats — the
    server loop rebinds both to the round's outputs, so keeping the old
    buffers alive only doubles peak HBM. Pass donate=False when the caller
    reuses the same input trees across calls (e.g. A/B equivalence tests).

    round_fn(global_params, global_bstats, client_batches, client_weights, rng)
        → (new_params, new_bstats, metrics)

    client_batches leaves have shape (num_clients, local_steps, batch, ...),
    sharded over the mesh "client" axis; num_clients must be divisible by the
    axis size (each device hosts num_clients/axis_size clients via vmap).

    A 2-D mesh with a "data" axis additionally shards each client's local
    BATCH over that axis: grads are pmean'd over "data" inside every local
    step (sharded compute, replicated client params), and FedAvg still psums
    over "client" — both collectives ride ICI.
    """
    server_lr = cfg.federated.server_lr
    axis = cfg.federated.mesh_axis
    data_axis = "data" if "data" in mesh.axis_names else None
    local_tx = build_local_optimizer(cfg)
    local_train = make_local_train(cfg, apply_fn, loss_fn, local_tx,
                                   data_axis=data_axis)

    def round_body(global_params, global_bstats, batches, weights, rng):
        # ---- per-device shard: (clients_per_device, ...) ------------------
        cpd = batches["label"].shape[0]
        dev_idx = jax.lax.axis_index(axis)

        def run_client(j, batch_j, weight_j):
            client_rng = jax.random.fold_in(rng, dev_idx * cpd + j)
            p, bs, loss = local_train(global_params, global_bstats,
                                      batch_j, client_rng)
            return p, bs, loss

        idx = jnp.arange(cpd)
        params_stack, bstats_stack, losses = jax.vmap(run_client)(
            idx, batches, weights)

        # ---- FedAvg: weighted sum over local clients, psum over ICI -------
        def wsum(stack):
            w = weights.reshape((cpd,) + (1,) * (stack.ndim - 1))
            return (stack * w).sum(axis=0)

        agg_params = jax.tree.map(wsum, params_stack)
        agg_params = jax.lax.psum(agg_params, axis)
        agg_bstats = jax.tree.map(wsum, bstats_stack)
        agg_bstats = jax.lax.psum(agg_bstats, axis)
        mean_loss = jax.lax.psum((losses * weights).sum(), axis)

        # server step: θ + η(θ̄ − θ)
        new_params = jax.tree.map(
            lambda g, a: g + server_lr * (a - g), global_params, agg_params)
        new_bstats = jax.tree.map(
            lambda g, a: g + server_lr * (a - g), global_bstats, agg_bstats)
        return new_params, new_bstats, {"loss": mean_loss}

    replicated = P()
    client_first = P(axis)
    # (clients, steps, batch, ...): batch dim sharded over "data" when present
    batch_spec = (P(axis, None, data_axis) if data_axis is not None
                  else client_first)

    sharded = shard_map(
        round_body, mesh=mesh,
        in_specs=(replicated, replicated, batch_spec, client_first,
                  replicated),
        out_specs=(replicated, replicated, replicated),
        check_vma=False,
    )
    # Without donation each round transiently holds old+new globals — at
    # ViT-L scale that is the difference between fitting and OOMing a
    # single 16 GB chip (round-5 measurement, bench_fed vitl). Safe in the
    # server loop: ema_init clones, assemble returns fresh batches/weights.
    return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())


def stack_client_batches(per_client_batches) -> Dict[str, "np.ndarray"]:
    """List of per-client {key: (S, B, ...)} dicts → {key: (C, S, B, ...)}."""
    import numpy as np
    return {k: np.stack([cb[k] for cb in per_client_batches], axis=0)
            for k in per_client_batches[0]}
