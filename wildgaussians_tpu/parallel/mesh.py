"""Device-mesh context for sharded rendering/training.

The reference is strictly single-GPU (SURVEY.md section 2.3); scaling here is
TPU-native: a 1-axis mesh ('tiles',) shards image tiles/pixels across devices
while Gaussian parameters stay replicated — parameter gradients reduce via the
psum XLA inserts for the replicated-in/sharded-out pattern. Modules consult the
active mesh through `current_mesh()` and constrain their tile-major tensors
with `shard_tiles`, so the same train-step code compiles single-chip (no mesh)
and multi-chip (mesh active) without restructuring.
"""
import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()

TILE_AXIS = "tiles"


def make_tile_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (TILE_AXIS,))


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev


def current_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


def shard_tiles(x, axis: int = 0):
    """Constrain `x` to be sharded along `axis` over the tile mesh axis
    (no-op when no mesh is active)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = TILE_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def replicated(x):
    mesh = current_mesh()
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * x.ndim))))
