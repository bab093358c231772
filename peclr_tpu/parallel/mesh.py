"""Mesh + sharding helpers.

The framework scales data-parallel over a 1-D "data" mesh axis by default
(the reference's only latent parallelism is DP; see SURVEY §2.2).  Model axes
("model") are declared up-front so tensor-parallel shardings can be added
without re-plumbing — GSPMD inserts the collectives.

All helpers work for any device count including 1 (single-chip jit) and
virtual CPU devices (tests).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  With `data=None`, uses all devices for
    data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with batch-sharded leaves."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
