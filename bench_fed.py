#!/usr/bin/env python3
"""Federated benchmark — FedAvg round wall-time (BASELINE.json tracks it).

Runs cfg #5-style federated training (clients sharded over the mesh,
psum/pmean aggregation each round) on the available devices and prints ONE
JSON line: {"metric": "fedavg_round_walltime_s", ...}. On the single-chip
host the mesh has one device hosting all clients (vmap); on a pod the same
code shards clients over ICI.
"""

from __future__ import annotations

import json
import sys
import time


def main(num_clients: int = 8, rounds: int = 5, local_steps: int = 4,
         batch_size: int = 16) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fedvit_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    from fedvit_tpu.core.config import from_dict
    from fedvit_tpu.data.synthetic import make_synthetic_dataset
    from fedvit_tpu.fed.server import train_federated
    from fedvit_tpu.models import build_model
    from fedvit_tpu.parallel.mesh import client_mesh

    cfg = from_dict({
        "model": {"backbone": "vit_base_patch16_224", "image_size": 224,
                  "compute_dtype": "bfloat16", "metadata": {"enabled": True}},
        "data": {"use_segmentation_mask": True},
        "training": {"batch_size": batch_size,
                     "gradient_accumulation_steps": 1,
                     "optimizer": {"lr": 1e-4},
                     "ema": {"enabled": True}},
        "loss": {"type": "asymmetric"},
        "federated": {"enabled": True, "num_clients": num_clients,
                      "rounds": rounds, "local_steps": local_steps,
                      "partition": "dirichlet", "dirichlet_alpha": 0.5},
    })

    data = make_synthetic_dataset(n=512, image_size=224, seed=0)
    data["image"] = np.concatenate([data["image"], data["mask"]], axis=-1)

    model = build_model(cfg)
    rng = jax.random.key(0)
    v = model.init({"params": rng, "dropout": rng},
                   jnp.zeros((2, 224, 224, 4)), jnp.zeros((2, 13)))

    result = train_federated(cfg, model, v, data, eval_data=None,
                             mesh=client_mesh(),
                             log_fn=lambda s: print(s, file=sys.stderr))
    times = [h["round_time_s"] for h in result.history[1:]]  # skip compile
    steady = float(np.median(times)) if times else float("nan")
    imgs_per_round = num_clients * local_steps * batch_size
    print(json.dumps({
        "metric": "fedavg_round_walltime_s",
        "value": round(steady, 3),
        "unit": "s/round",
        "vs_baseline": None,   # the reference has no federated implementation
        "num_clients": num_clients,
        "local_steps": local_steps,
        "batch_size": batch_size,
        "images_per_round": imgs_per_round,
        "round_images_per_sec": round(imgs_per_round / steady, 1),
        "note": "single-chip wall-time includes host-side batch assembly",
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
