"""Device mesh construction and batch/param sharding.

The reference has no multi-device parallelism (SURVEY §2: single GPU,
SLURM gres gpu:1). Here scale-out is first-class and TPU-shaped:

* 1-D `('data',)` mesh — batch data-parallelism over ICI; the natural fit
  for batch-8..20 polyp workloads and for sampling fan-out (per-class quota
  generation parallelizes trivially).
* 2-D `('data','model')` mesh — adds tensor-sharded attention/FF for the
  860M SD UNet (see sharding.py) when it outgrows one chip's HBM.
* Multi-host: `jax.distributed.initialize()` over DCN, then the same mesh
  spans all processes; per-host data sharding comes from `shard_batch`.

Collectives are never written by hand here — jit over sharded arrays lets
XLA insert psum/all-gather on ICI (the scaling-book recipe).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Mapping[str, int] | None = None,
              devices=None) -> Mesh:
    """Mesh over the given axis sizes, e.g. {'data': 4, 'model': 2}.
    Defaults to a 1-D data mesh over all local devices."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes)
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(axes)} needs {np.prod(sizes)} devices, "
                         f"got {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def local_mesh(max_devices: int | None = None) -> Mesh:
    """1-D data mesh over (up to) all local devices."""
    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    return make_mesh({"data": len(devices)}, devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim on 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put every array in a batch pytree with batch-dim sharding."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)


def mesh_from_spec(spec: str | None, devices=None) -> Mesh | None:
    """Parse a CLI mesh spec like ``"data=8"`` or ``"data=4,model=2"`` into a
    Mesh; `None`/empty → no mesh (single-device execution). ``"data=-1"``
    fills the axis with all remaining devices — so ``--mesh data=-1`` is
    "use every chip" regardless of slice size."""
    if not spec:
        return None
    devices = devices if devices is not None else jax.devices()
    axes: dict[str, int] = {}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        name = name.strip()
        if not name or not val.strip().lstrip("-").isdigit():
            raise ValueError(f"bad mesh spec {spec!r}; want e.g. "
                             "'data=8' or 'data=4,model=2'")
        size = int(val)
        if size < 1 and size != -1:
            raise ValueError(f"bad axis size {size} in {spec!r}; axis sizes "
                             "must be >= 1 (-1 = fill with all devices)")
        axes[name] = size
    fill = [k for k, v in axes.items() if v == -1]
    if len(fill) > 1:
        raise ValueError(f"only one axis may be -1 in {spec!r}")
    if fill:
        rest = int(np.prod([v for v in axes.values() if v != -1]))
        if len(devices) % rest:
            raise ValueError(f"{len(devices)} devices not divisible by {rest}")
        axes[fill[0]] = len(devices) // rest
    n = int(np.prod(list(axes.values())))
    return make_mesh(axes, devices[:n])


def replicate_to(tree: Any, mesh: Mesh) -> Any:
    """device_put every array leaf fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)


def validate_batch_for_mesh(batch_size: int, mesh: Mesh | None,
                            what: str = "batch_size") -> None:
    """Data-parallel batches must split evenly over the 'data' axis."""
    if mesh is None or "data" not in mesh.axis_names:
        return
    d = mesh.shape["data"]
    if batch_size % d:
        raise ValueError(
            f"{what}={batch_size} not divisible by mesh data axis ({d}); "
            f"pick a multiple of {d}")


def multihost_init() -> None:
    """Bring-up for multi-host pods over DCN (no-op on a single process).

    Cluster environments (TPU pods, SLURM, GKE) auto-detect through
    jax.distributed.initialize(); bare launches configure explicitly via
    COORDINATOR_ADDRESS + JAX_PROCESS_COUNT + JAX_PROCESS_ID — the path the
    real 2-process CPU test drives (tests/test_multiprocess.py)."""
    nproc_env = os.environ.get("JAX_PROCESS_COUNT")
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr and (nproc_env is None or int(nproc_env) <= 1):
        # single process (explicitly or by default) and no coordinator:
        # nothing to bring up
        return
    kwargs: dict = {}
    if addr and nproc_env is not None:
        # bare launch: fully explicit topology
        kwargs = dict(coordinator_address=addr, num_processes=int(nproc_env),
                      process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    elif addr:
        # cluster launch that pins only the coordinator: let
        # jax.distributed auto-detect num_processes/process_id (passing
        # num_processes=1 here would make every rank claim to be the
        # whole cluster)
        kwargs = dict(coordinator_address=addr)
    jax.distributed.initialize(**kwargs)
