"""Federated training CLI — the capability the reference is named for.

    python -m fedvit_tpu.cli.train_federated --config config.yaml \
        [--clients 8] [--rounds 10] [--synthetic N] [--log DIR] [--seed N]

Clients are partitioned (Dirichlet class-skew by default), mapped onto the
device mesh "client" axis, and each round runs as ONE compiled program with
FedAvg aggregation over ICI (fed/fedavg.py). --synthetic N trains on the
synthetic ISIC-like fixture (no dataset download needed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Federated (FedAvg) training")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--clients", type=int, default=None)
    parser.add_argument("--rounds", type=int, default=None)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic samples instead of ISIC")
    parser.add_argument("--log", type=str, default="logs_fed")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the last federated checkpoint "
                             "in <log>/ckpt (bit-identical trajectory)")
    parser.add_argument("--checkpoint-every", type=int, default=1,
                        help="save federated server state every N rounds "
                             "(0 disables checkpointing)")
    args = parser.parse_args(argv)

    from fedvit_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from fedvit_tpu.core.config import Config, load_config
    from fedvit_tpu.fed.server import train_federated
    from fedvit_tpu.models import build_model

    cfg = load_config(args.config) if args.config else Config()
    cfg = cfg.replace(seed=args.seed)
    fed = cfg.federated
    over = {}
    if args.clients is not None:
        over["num_clients"] = args.clients
        over["clients_per_round"] = args.clients
    if args.rounds is not None:
        over["rounds"] = args.rounds
    fed = dataclasses.replace(fed, enabled=True, **over)
    cfg = cfg.replace(federated=fed)

    os.makedirs(args.log, exist_ok=True)

    # ---- data --------------------------------------------------------------
    if args.synthetic > 0:
        from fedvit_tpu.data.synthetic import make_synthetic_dataset
        size = cfg.model.image_size
        data = make_synthetic_dataset(n=args.synthetic, image_size=size,
                                      seed=cfg.seed)
        if cfg.data.use_segmentation_mask:
            data["image"] = np.concatenate([data["image"], data["mask"]], -1)
        n_eval = max(8, args.synthetic // 8)
        eval_data = {k: v[:n_eval] for k, v in data.items()}
        train_data = {k: v[n_eval:] for k, v in data.items()}
    else:
        from fedvit_tpu.data.isic import load_isic_data
        from fedvit_tpu.data.pipeline import HostDataSource
        train_df, test_df = load_isic_data(cfg.data.isic_dir)
        src = HostDataSource(train_df, cfg)
        idx = np.arange(len(src))
        raw = src.gather(idx)
        train_data = {"image": raw["image"], "label": raw["label"],
                      "metadata": raw["metadata"]}
        eval_data = None
        if len(test_df):
            tsrc = HostDataSource(test_df, cfg)
            eval_data = tsrc.gather(np.arange(len(tsrc)))

    # Images stay raw (uint8 canvas or [0,1] float): every client's local
    # step and the per-round eval run the device augmentation pipeline
    # (fed/fedavg.make_local_train, fed/server.train_federated), which owns
    # the canvas→image_size geometry and normalization.
    size = cfg.model.image_size

    # ---- model + run -------------------------------------------------------
    model = build_model(cfg)
    rng = jax.random.key(cfg.seed)
    x = jnp.zeros((2, size, size, cfg.in_channels))
    meta = jnp.zeros((2, cfg.model.metadata.input_dim))
    variables = model.init({"params": rng, "dropout": rng}, x, meta)

    if args.resume and args.checkpoint_every <= 0:
        raise SystemExit(
            "--resume requires --checkpoint-every > 0: with checkpointing "
            "disabled there is no workdir to resume from (and the resumed "
            "run would stop persisting progress).")
    workdir = (os.path.join(args.log, "ckpt")
               if args.checkpoint_every > 0 else None)
    result = train_federated(cfg, model, variables, train_data, eval_data,
                             workdir=workdir, resume=args.resume,
                             checkpoint_every=max(1, args.checkpoint_every))

    hist_path = os.path.join(args.log, "federated_history.json")
    with open(hist_path, "w") as f:
        json.dump(result.history, f, indent=2)
    print(f"History saved → {hist_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
