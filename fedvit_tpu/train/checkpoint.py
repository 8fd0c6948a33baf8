"""Checkpointing — full train-state persistence with true resume.

The reference saves {epoch, model, optimizer, scheduler, EMA, best_metric,
config} on every new best (utils.py:287-308) but has NO mid-training resume
path (SURVEY.md §5). Here a checkpoint is the complete TrainState pytree
(params, opt_state, EMA shadow, batch_stats, step, rng) plus host-side loop
state (epoch, best metric, early-stop counter) and the config — restoring it
resumes training exactly where it stopped.

Backend: orbax PyTreeCheckpointer (async-capable, TPU-friendly sharded
arrays supported out of the box).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from fedvit_tpu.core.config import Config, to_dict


def _state_tree(state) -> Dict[str, Any]:
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


def save_checkpoint(path: str, state, epoch: int, best_metric: float,
                    epochs_without_improve: int = 0,
                    cfg: Optional[Config] = None) -> None:
    """Write a full training checkpoint to `path` (a directory)."""
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path / "state", _state_tree(state), force=True)
    meta = {
        "epoch": int(epoch),
        "best_metric": float(best_metric),
        "epochs_without_improve": int(epochs_without_improve),
        "config": to_dict(cfg) if cfg is not None else None,
    }
    (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))


def load_checkpoint(path: str, state) -> Dict[str, Any]:
    """Restore into the structure of `state` (a freshly-built TrainState).

    Returns {"state": restored TrainState, "epoch", "best_metric",
    "epochs_without_improve", "config"}."""
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    target = jax.tree.map(np.asarray, _state_tree(state))
    restored = ckptr.restore(path / "state", item=target)

    new_state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(restored["opt_state"])),
        ema_params=restored.get("ema_params"),
        rng=jax.random.wrap_key_data(jax.numpy.asarray(restored["rng"])),
    )
    meta = json.loads((path / "meta.json").read_text())
    meta["state"] = new_state
    return meta


def checkpoint_exists(path: str) -> bool:
    p = Path(path)
    return (p / "meta.json").exists() and (p / "state").exists()


# --- pretrained starting points (cli.import_weights → train_fold) ----------
#
# A "pretrained checkpoint" is just {params, batch_stats} + provenance meta —
# the converted form of the reference's timm download (model.py:112-166).
# It deliberately has NO optimizer/EMA/step state: it is a starting point,
# not a resume point.

def save_pretrained(path: str, variables: Dict[str, Any],
                    cfg: Optional[Config] = None,
                    source: str = "") -> None:
    """Write converted pretrained variables ({"params", "batch_stats"})."""
    path = Path(path).absolute()
    tree = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    ocp.PyTreeCheckpointer().save(path / "variables", tree, force=True)
    meta = {
        "kind": "pretrained",
        "source": source,
        "backbone": cfg.model.backbone if cfg else None,
        "image_size": cfg.model.image_size if cfg else None,
        "in_channels": cfg.in_channels if cfg else None,
    }
    (path / "pretrained_meta.json").write_text(json.dumps(meta, indent=2))


def load_pretrained(path: str, variables: Dict[str, Any],
                    cfg: Optional[Config] = None) -> Dict[str, Any]:
    """Restore converted pretrained variables into the structure of fresh
    `variables`; refuses a checkpoint converted for a different model."""
    path = Path(path).absolute()
    meta = json.loads((path / "pretrained_meta.json").read_text())
    if cfg is not None and meta.get("backbone") is not None:
        for got, want, name in (
                (meta["backbone"], cfg.model.backbone, "backbone"),
                (meta["image_size"], cfg.model.image_size, "image_size"),
                (meta["in_channels"], cfg.in_channels, "in_channels")):
            if got != want:
                raise ValueError(
                    f"pretrained checkpoint at {path} was converted for "
                    f"{name}={got!r} but the config wants {want!r} — "
                    f"re-run cli.import_weights with this config")
    target = {"params": jax.tree.map(np.asarray, variables["params"]),
              "batch_stats": jax.tree.map(np.asarray,
                                          variables.get("batch_stats", {}))}
    restored = ocp.PyTreeCheckpointer().restore(path / "variables",
                                                item=target)
    out = dict(variables)
    out["params"] = restored["params"]
    out["batch_stats"] = restored["batch_stats"]
    return out


def pretrained_exists(path: str) -> bool:
    p = Path(path)
    return (p / "pretrained_meta.json").exists() and (p / "variables").exists()


# --- federated server state (SURVEY §5 "per-round federated server state") --
#
# A federated run's full restart surface is {params, batch_stats, EMA shadow,
# jax round key, host numpy RNG state, round number, history}. Saving the two
# RNGs makes resume BIT-IDENTICAL: client sampling (numpy) and local-step
# dropout/augment keys (jax) continue exactly where the dead run stopped.
# (Reference checkpoint surface: utils.py:287-308 — epoch trainer only; the
# reference has no federated persistence at all.)

def _fed_dir(path: str) -> Path:
    """The live federated checkpoint directory, falling back to the `.old`
    generation if a crash landed between the two swap renames."""
    p = Path(path).absolute()
    live, old = p / "fed_ckpt", p / "fed_ckpt.old"
    if (live / "fed_meta.json").exists():
        return live
    return old


def save_federated_checkpoint(path: str, params, batch_stats, ema_params,
                              rnd: int, history, np_rng_state: Dict,
                              key, cfg: Optional[Config] = None) -> None:
    """Persist per-round federated server state to `path` (a directory).

    Crash-safe: state + meta are written together into `fed_ckpt.tmp/`
    and promoted with two directory renames (atomic on one filesystem);
    the previous generation survives as `fed_ckpt.old` until the new one
    is live, so every crash window leaves a loadable checkpoint — state
    and meta can never desynchronize."""
    base = Path(path).absolute()
    tmp, live, old = base / "fed_ckpt.tmp", base / "fed_ckpt", \
        base / "fed_ckpt.old"
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    tree = {
        "params": params,
        "batch_stats": batch_stats,
        "key": jax.random.key_data(key),
    }
    if ema_params is not None:
        tree["ema_params"] = ema_params
    ocp.PyTreeCheckpointer().save(tmp / "fed_state", tree)
    meta = {
        "round": int(rnd),
        "history": history,
        "np_rng_state": np_rng_state,   # PCG64 state dict — plain ints
        "config": to_dict(cfg) if cfg is not None else None,
    }
    (tmp / "fed_meta.json").write_text(json.dumps(meta, indent=2,
                                                  default=str))
    if old.exists():
        shutil.rmtree(old)
    if live.exists():
        live.rename(old)
    tmp.rename(live)
    if old.exists():
        shutil.rmtree(old)


def load_federated_checkpoint(path: str, params, batch_stats,
                              ema_params) -> Dict[str, Any]:
    """Restore federated server state into the given template structures.

    Returns {"params", "batch_stats", "ema_params", "key", "round",
    "history", "np_rng_state", "config"}."""
    path = _fed_dir(path)
    target = {
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, batch_stats),
        "key": np.zeros((2,), np.uint32),
    }
    if ema_params is not None:
        target["ema_params"] = jax.tree.map(np.asarray, ema_params)
    restored = ocp.PyTreeCheckpointer().restore(path / "fed_state",
                                                item=target)
    meta = json.loads((path / "fed_meta.json").read_text())
    return {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
        "ema_params": restored.get("ema_params"),
        "key": jax.random.wrap_key_data(
            jax.numpy.asarray(restored["key"])),
        "round": int(meta["round"]),
        "history": meta["history"],
        "np_rng_state": meta["np_rng_state"],
        "config": meta.get("config"),
    }


def federated_checkpoint_exists(path: str) -> bool:
    p = _fed_dir(path)
    return (p / "fed_meta.json").exists() and (p / "fed_state").exists()
