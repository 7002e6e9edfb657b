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


def shard_store(tree, capacity: int):
    """Constrain every [capacity, ...] array in a pytree to shard its
    leading (Gaussian) axis over the mesh (no-op without a mesh).

    The 1-axis mesh doubles as the Gaussian axis: the sharded sort engine
    (rasterize_pallas._make_sharded_sort_blend_vjp) consumes per-Gaussian
    arrays sharded exactly this way, so constraining the store makes the
    WHOLE train step — get_gaussians, preprocess, Adam, densification
    stats — scale 1/D in memory and FLOPs with no resharding collective
    at the blend boundary (the >HBM-count tensor-parallel path)."""
    mesh = current_mesh()
    if mesh is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: shard_tiles(a)
        if getattr(a, "ndim", 0) >= 1 and a.shape[0] == capacity else a,
        tree)
