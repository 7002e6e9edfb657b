"""Send-cap drop accounting of the Gaussian-sharded sort engine.

Isolated in its own file: the 8-device interpret-mode engine compile takes
~8 minutes on CPU, and xdist distributes by file.
"""
import numpy as np
import jax
import jax.numpy as jnp


def test_sharded_send_cap_drops_reported(rng):
    """The sharded engine's static send buffer truncates per-(sender, band)
    segments beyond C = send_beta * R_loc / D; the drop count must surface
    (no silent caps) and a generous beta must restore exactness."""
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh

    # big footprints + many points: the central bands receive ~350 entries
    # per sender (measured), beyond the tight cap's 2*K = 256 floor
    scene = make_scene(rng, n=2400, spread=0.3, z_range=(4.0, 5.0))
    scene["scales"] *= 6.0
    cam = make_camera(width=64, height=64)
    params, w, h = wc.make_camera_params(cam)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]),
                          jnp.asarray(scene["rotations"]))
    pre = preprocess(jnp.asarray(scene["xyz"]), cov3d,
                     jnp.asarray(scene["opacities"]), params, w, h, 0.1)
    grid = make_grid(w, h, 16)
    colors = jnp.asarray(scene["colors"])
    n = colors.shape[0]
    geo = (pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched, pre.valid)
    bg = jnp.zeros((3,), jnp.float32)
    mesh = make_tile_mesh(jax.devices()[:8])

    def run(beta):
        outs, aux = rasterize_pallas_multi(
            pre.mean2d, pre.conic, pre.opacity, [colors],
            jnp.zeros((n, 2)), *geo, bg, grid=grid, chunk=128,
            max_tiles_per_gaussian=16, big_fraction=0.5, mesh=mesh,
            binning="sort", send_beta=beta, return_aux=True)
        return outs[0][0], int(aux["send_drops"])

    # one engine compile only (each distinct C is ~8 min of CPU compile);
    # the zero-drop + single-chip-match side is covered by
    # test_sharded_sort_engine_matches_single (send_beta=2 never truncates
    # at that scale)
    img_tight, drops_tight = run(0.01)   # C floors at 2*K = 256 < segments
    assert drops_tight > 0
    assert np.isfinite(np.asarray(img_tight)).all()
