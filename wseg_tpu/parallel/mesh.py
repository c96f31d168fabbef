"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's entire distributed stack (`torch.nn.DataParallel` at
contrast_train.py:108 / aff_train.py:93, the thread-pool replica inference at
contrast_infer.py:46-71, and the ~800-LoC thread-rendezvous SyncBN package
at segmentation/lib/net/sync_batchnorm/).

Model: one `jax.sharding.Mesh` with a `data` axis over all local chips.
Batches are sharded over `data`; params/optimizer state are replicated. All
compute runs under jit (GSPMD), so gradient all-reduce and global-batch BN
statistics come out of XLA as ICI collectives — no hand-written communication.
A second mesh axis (`space`) is reserved for sharding the dense hw x hw
affinity/PCM matmuls if image resolution ever outgrows one chip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int, axis_name: str = "data") -> Mesh:
    """Mesh over the largest device subset whose size divides `batch_size`
    (a sharded leading dim must divide evenly; DataParallel scatters uneven
    remainders, GSPMD does not)."""
    import math

    devices = jax.devices()
    n = math.gcd(batch_size, len(devices))
    if n < len(devices):
        print(
            f"WARNING: batch_size {batch_size} is not divisible by the "
            f"{len(devices)} local devices -- training data-parallel on only "
            f"{n} device(s); pick a divisible batch size to use every chip",
            flush=True,
        )
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a pytree of host arrays with the leading dim sharded over the
    mesh's data axis."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
