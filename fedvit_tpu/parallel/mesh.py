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


def hybrid_mesh(slices: int, per_slice: int,
                axis_names: Sequence[str] = ("client", "data"),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D hybrid mesh for multi-slice scale-out (SURVEY §2.3/§7).

    Outer axis ("client" by default) spans SLICES — traffic on it crosses
    DCN — while the inner axis ("data") stays within a slice, riding ICI.
    FedAvg maps onto this naturally: the once-per-round weighted psum of
    client deltas is the only collective that pays DCN latency, while the
    per-step gradient pmean inside every client stays on ICI.

    On a real multi-slice pod the grouping uses each device's
    ``slice_index`` (jax.experimental.mesh_utils.create_hybrid_device_mesh
    semantics) so the physical layout matches the logical one. On
    single-slice or CPU hosts there is no slice topology; device order
    stands in for it — the mesh SHAPE (and therefore every sharding and
    compiled collective) is identical, only the physical locality differs.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = slices * per_slice
    assert need <= len(devices), (
        f"hybrid mesh {slices}x{per_slice} needs {need} devices, "
        f"have {len(devices)}")
    devices = devices[:need]
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) > 1 and None not in slice_ids:
        from jax.experimental import mesh_utils
        # per-axis shape = mesh_shape[i] * dcn_mesh_shape[i]:
        # (1, per_slice) x (slices, 1) -> (slices, per_slice), with the
        # outer axis the only one crossing slice (DCN) boundaries.
        arr = np.asarray(mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (slices, 1), devices=devices))
        arr = arr.reshape(slices, per_slice)
    else:
        arr = np.array(devices).reshape(slices, per_slice)
    return Mesh(arr, tuple(axis_names))


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
