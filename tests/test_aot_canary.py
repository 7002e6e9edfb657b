"""Canaries for the `_aot_under_mesh` workaround (VERDICT r3 weak #7).

`models/wildgaussians.py:_aot_under_mesh` exists because jax 0.9's C++
dispatch fastpath — which engages on a jit function's THIRD call —
mis-handles lifted constants of programs containing the Gaussian-sharded
sort engine's shard_map + all_to_all (IndexError / buffer-count
mismatches during argument sharding). The trainer therefore runs its
mesh-step functions as AOT lower().compile() executables.

Two canaries:
  1. the FULL trainer driven with WG_NO_AOT=1 (plain jit dispatch) —
     XFAILS on the live bug today (round-4 repro: IndexError inside
     dispatch on the densify path). The day a jax upgrade fixes the
     underlying bug this XPASSes loudly and the workaround can be
     retired deliberately instead of rotting silently.
  2. a REDUCED repro (donated, explicitly-sharded input through a jitted
     sharded-sort render, >=4 dispatches) — recorded XPASS on this jax
     build: the reduced shape is NOT sufficient to trigger the bug, so
     the trainer canary above is the load-bearing one.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.xfail(strict=False,
                   reason="jax 0.9 dispatch-fastpath bug with lifted "
                          "constants in shard_map+all_to_all programs "
                          "(models/wildgaussians.py:_aot_under_mesh); "
                          "XPASS => workaround may be removable")
def test_full_trainer_without_aot_workaround(rng, monkeypatch):
    """Drive the real mesh trainer (sharded store + densify) with the AOT
    workaround bypassed. Reproduces the live jax-0.9 crash."""
    monkeypatch.setenv("WG_NO_AOT", "1")
    from test_parallel import _run_sharded_training

    _run_sharded_training(rng, shard_store=True)


def test_repeated_plain_jit_dispatch_of_sharded_sort_engine():
    """Reduced repro — recorded XPASS-equivalent (plain test): donation +
    explicit shardings + 5 dispatches do NOT trigger the fastpath bug at
    this program size; kept as documentation of what was ruled out."""
    from jax.sharding import Mesh
    from wildgaussians_tpu.parallel.mesh import use_mesh
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid
    from wildgaussians_tpu.ops.gaussians import preprocess, compute_cov3d
    from wildgaussians_tpu.cameras import make_camera_params
    from wildgaussians_tpu.types import new_cameras

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest provides the 8-device CPU mesh"
    mesh = Mesh(devs, ("tiles",))

    n, w, h = 256, 64, 48
    f = w / 1.2
    cam = new_cameras(
        poses=np.eye(4, dtype=np.float32)[:3][None],
        intrinsics=np.array([[f, f, w / 2, h / 2]], np.float32),
        camera_models=np.zeros((1,), np.int32),
        distortion_parameters=np.zeros((1, 6), np.float32),
        image_sizes=np.array([[w, h]], np.int32))
    params, pw, ph = make_camera_params(cam)
    rng = np.random.default_rng(0)
    xyz = np.concatenate([rng.uniform(-1, 1, (n, 2)),
                          rng.uniform(3, 7, (n, 1))], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.08, (n, 3)).astype(np.float32)
    q = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    grid = make_grid(pw, ph, 16)

    from jax.sharding import NamedSharding, PartitionSpec as P

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(xyz, scales, q, opac, colors):
        cov3d = compute_cov3d(scales, q)
        pre = preprocess(xyz, cov3d, opac, params, pw, ph, 0.1, tile_size=16)
        outs = rasterize_pallas_multi(
            pre.mean2d, pre.conic, pre.opacity, [colors],
            jnp.zeros((n, 2)), pre.depth, pre.rect_min, pre.rect_max,
            jnp.minimum(pre.tiles_touched, 8), pre.valid, jnp.zeros((3,)),
            grid=grid, chunk=256, max_tiles_per_gaussian=8, d_small=4,
            big_fraction=1.0, binning="sort", mesh=mesh)
        img, _t = outs[0]
        return jnp.mean(img)

    with use_mesh(mesh):
        args = tuple(map(jnp.asarray, (xyz, scales, q, opac, colors)))
        gshard = NamedSharding(mesh, P("tiles"))
        vals = []
        # >= 4 calls: the fastpath engages on the THIRD; vary inputs so
        # calls cannot be deduped. xyz is DONATED and explicitly sharded
        # on the gaussian axis — the combination the trainer's
        # store-updating executables hit (sharded store + donation).
        for i in range(5):
            x = jax.device_put(args[0] + np.float32(i) * 1e-4, gshard)
            vals.append(float(step(x, *args[1:])))
        # if dispatch survives, the results must at least be consistent
        assert np.isfinite(vals).all()
        assert abs(vals[0] - vals[-1]) < 1e-2, vals
