"""Pathological ownership-skew stress for the Gaussian-sharded sort engine
(VERDICT r3 #6): every visible Gaussian owned by ONE shard.

The engine's big-Gaussian pool and send caps are PER SHARD (m_cap =
n_loc * big_fraction, C = send_beta * R_loc / D), so a shard owning all
the visible load truncates earlier than the single-chip pool would. The
store shuffles initial points exactly to avoid this (gaussian_store
init_params_from_points), and the dryrun historically sidestepped it with
big_fraction=1.0 — this test drives the worst case head-on and asserts
the failure is VISIBLE (overflow/send-drop accounting), never silent, and
that the adaptation knobs (big_fraction up, send_beta up) restore
exactness against the single-chip engine.

Own file: 8-device interpret-mode engine compiles are minutes each on
CPU; xdist distributes by file.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def skewed():
    rng = np.random.default_rng(7)
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess

    D = 8
    n = 4096
    n_vis = n // D           # == one shard's worth
    scene = make_scene(rng, n=n_vis, spread=1.2, z_range=(4.0, 6.0))
    scene["scales"] *= 2.5   # several tiles per gaussian
    # shard 0 owns ALL visible gaussians (contiguous block partitioning);
    # everyone else owns gaussians behind the camera (culled)
    xyz = np.concatenate([scene["xyz"],
                          np.tile(np.array([[0, 0, -10.0]], np.float32),
                                  (n - n_vis, 1))])
    scales = np.concatenate([scene["scales"],
                             np.full((n - n_vis, 3), 0.01, np.float32)])
    rots = np.concatenate([scene["rotations"],
                           np.tile(np.array([[1, 0, 0, 0]], np.float32),
                                   (n - n_vis, 1))])
    opac = np.concatenate([scene["opacities"],
                           np.full((n - n_vis,), 0.5, np.float32)])
    colors = np.concatenate([scene["colors"],
                             np.zeros((n - n_vis, 3), np.float32)])
    cam = make_camera(width=64, height=64)
    params, w, h = wc.make_camera_params(cam)
    cov3d = compute_cov3d(jnp.asarray(scales), jnp.asarray(rots))
    pre = preprocess(jnp.asarray(xyz), cov3d, jnp.asarray(opac),
                     params, w, h, 0.1)
    return pre, jnp.asarray(colors), w, h, n


def _run(pre, colors, w, h, n, mesh, *, big_fraction, send_beta):
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid

    grid = make_grid(w, h, 16)
    geo = (pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched,
           pre.valid)
    outs, aux = rasterize_pallas_multi(
        pre.mean2d, pre.conic, pre.opacity, [colors],
        jnp.zeros((n, 2)), *geo, jnp.zeros((3,), jnp.float32), grid=grid,
        chunk=128, max_tiles_per_gaussian=12, big_fraction=big_fraction,
        mesh=mesh, binning="sort", send_beta=send_beta, return_aux=True)
    return np.asarray(outs[0][0]), int(aux["send_drops"])


def test_skewed_ownership_surfaces_and_recovers(skewed):
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh

    pre, colors, w, h, n = skewed
    mesh = make_tile_mesh(jax.devices()[:8])

    # single-chip reference (no mesh)
    ref, ref_drops = _run(pre, colors, w, h, n, None,
                          big_fraction=1.0, send_beta=2.0)
    assert ref_drops == 0

    # worst case: tight per-shard send cap under total skew -> the one
    # loaded shard MUST report drops (C = beta * R_loc / D floors at 2K)
    img_tight, drops = _run(pre, colors, w, h, n, mesh,
                            big_fraction=1.0, send_beta=0.05)
    assert drops > 0, "skew truncation must never be silent"
    assert np.isfinite(img_tight).all()

    # adaptation target: generous send_beta (the trainer's persistent-drop
    # response raises pallas_send_beta) restores exactness vs single-chip
    # even with EVERY entry crossing from one shard. send_beta covers the
    # skew because C scales with R_loc (the loaded shard's own entry
    # count), not the balanced average.
    img_ok, drops_ok = _run(pre, colors, w, h, n, mesh,
                            big_fraction=1.0, send_beta=float(8 * 1.1))
    assert drops_ok == 0
    np.testing.assert_allclose(img_ok, ref, atol=2e-2)
