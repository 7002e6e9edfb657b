"""Multi-host (multi-process) training support.

The reference is strictly single-process/single-GPU (SURVEY.md section 2.3,
method.py:113-117); this module is the TPU-native scaling story for pod
slices (BASELINE config #5: Photo Tourism on v4-16, tiles sharded across
hosts with >=80% scaling efficiency):

  - every process calls `init_multihost()` once at startup;
    `jax.distributed.initialize` wires the coordinator from the standard
    env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID)
    or TPU pod metadata. A single process with no env is a no-op.
  - training runs the SAME camera on every host each step (reference
    semantics: one camera per iteration, method.py:1897-1901); the image's
    tile rows are sharded over the global ('tiles',) mesh, so each host
    feeds only its own horizontal band of the ground-truth image via
    `make_global_image`. Gaussian parameters are replicated; their
    gradients all-reduce over ICI inside the sharded backward
    (rasterize_pallas / rasterize_tiled), never over DCN per-tensor.
  - camera selection must agree across hosts: `step_camera_id` derives the
    pick deterministically from the step counter, not host RNG.
"""
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TILE_AXIS

_initialized = False


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-process runs.

    Explicit args win; otherwise the standard JAX_* env vars (or TPU pod
    metadata) are used. Returns True when a multi-process runtime was set
    up, False for the single-process no-op. Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1"))
    if coordinator_address is None and n <= 1:
        _initialized = True
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=n if n > 0 else None,
                               process_id=pid if pid >= 0 else None)
    _initialized = True
    return jax.process_count() > 1


def global_tile_mesh() -> Mesh:
    """1-axis ('tiles',) mesh over ALL devices of all processes."""
    return Mesh(np.asarray(jax.devices()), (TILE_AXIS,))


def step_camera_id(step: int, num_cameras: int, seed: int = 0) -> int:
    """Deterministic camera pick, identical on every host.

    Matches the reference's shuffle-stack semantics (method.py:1897-1901):
    a per-epoch permutation without replacement, derived from (seed, epoch)
    so no cross-host RNG coordination is needed.
    """
    epoch, pos = divmod(step, num_cameras)
    perm = np.random.default_rng((seed, epoch)).permutation(num_cameras)
    return int(perm[pos])


def host_tile_rows(height: int, tile_size: int = 16) -> tuple:
    """The [row0, row1) pixel-row band of the image this host feeds.

    Tiles are row-major over the ('tiles',) mesh, so a host's device block
    owns a contiguous band of tile rows when grid_y % process_count == 0
    (pad image height accordingly).
    """
    grid_y = (height + tile_size - 1) // tile_size
    pc = jax.process_count()
    rows_per = (grid_y + pc - 1) // pc
    r0 = min(jax.process_index() * rows_per, grid_y) * tile_size
    r1 = min((jax.process_index() + 1) * rows_per, grid_y) * tile_size
    return r0, min(r1, height)


def make_global_image(local_band: np.ndarray, height: int, width: int,
                      mesh: Mesh):
    """Assemble a [H, W, 3] device array sharded by tile rows from this
    host's band (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P(TILE_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_band), (height, width, 3))
