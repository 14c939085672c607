"""Mesh construction + sharding helpers.

Design (scaling-book recipe): one global mesh with a single ``data`` axis for
ray/pixel parallelism — the NeRF/style MLPs are tiny (<2 M params) so tensor
parallelism buys nothing; params are replicated and gradient reduction is a
psum XLA inserts automatically when the loss averages over the sharded batch
axis. For multi-host slices the same mesh spans all processes
(`jax.distributed.initialize` is the caller's job); ray batches then shard
over ICI first.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D ``data`` mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (DATA_AXIS,))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading axis over ``data``, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree of batch arrays with the leading axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree
    )


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return ((n + m - 1) // m) * m
