"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed process-group bootstrap
(open_clip/src/open_clip_train/distributed.py:93-195, backend table nccl/hccl/
ccl/gloo) with a single jax.sharding.Mesh: data axis for batch sharding and an
optional model axis for tensor parallelism (needed only for the 7B LLaVA stack,
SURVEY.md §2e). Collectives ride ICI via pjit/shard_map — there is no NCCL
analogue to manage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} mesh does not tile {len(devices)} devices"
    )
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, replicated_spec())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree onto the mesh, sharded along the leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
