"""Device mesh construction and sharding helpers.

The reference is strictly single-device (get_device picks exactly one;
/root/reference/utils.py:36-43) with no communication backend at all
(SURVEY.md §2.3). Here parallelism is expressed the TPU way: a
`jax.sharding.Mesh` over ICI, `NamedSharding` annotations, and XLA-inserted
collectives — no NCCL/MPI translation layer.

Axes used by the framework:
  * "client" — federated clients (FedAvg aggregation = psum over this axis)
  * "data"   — batch data-parallelism within a client (grads pmean'd by XLA)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str],
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh from the available devices.

    axis size −1 means "whatever is left" (at most one −1)."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = list(axis_sizes)
    if -1 in sizes:
        i = sizes.index(-1)
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[i] = len(devices) // known
    total = int(np.prod(sizes))
    assert total <= len(devices), (
        f"mesh {dict(zip(axis_names, sizes))} needs {total} devices, "
        f"have {len(devices)}")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(axis_names))


def client_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all devices for federated client parallelism."""
    devs = jax.devices()[:num_devices] if num_devices else jax.devices()
    return make_mesh([len(devs)], ["client"], devs)


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh for plain data parallelism."""
    devs = jax.devices()[:num_devices] if num_devices else jax.devices()
    return make_mesh([len(devs)], ["data"], devs)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along its leading dim."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_leading(mesh: Mesh, tree, axis: str):
    """Shard every leaf's leading dimension along a mesh axis (e.g. stacked
    per-client states along "client")."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)
