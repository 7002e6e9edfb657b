"""Reference-surface adapter (GaussianRasterizationSettings/Rasterizer)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_camera, make_scene
import wildgaussians_tpu.cameras as wc
from wildgaussians_tpu.ops.raster_api import (GaussianRasterizationSettings,
                                              GaussianRasterizer)
from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
from wildgaussians_tpu.ops.gaussians import compute_cov3d


def _settings_and_camera(width=64, height=48, kernel_size=0.1):
    cam = make_camera(width=width, height=height)
    params, w, h = wc.make_camera_params(cam)
    # the reference stores TRANSPOSED (row-vector) matrices
    settings = GaussianRasterizationSettings(
        image_height=h, image_width=w,
        tanfovx=float(params.tan_fov[0]), tanfovy=float(params.tan_fov[1]),
        kernel_size=kernel_size, subpixel_offset=None,
        bg=jnp.zeros((3,), jnp.float32), scale_modifier=1.0,
        viewmatrix=params.viewmatrix.T, projmatrix=params.projmatrix.T,
        sh_degree=1, campos=params.campos, prefiltered=False, debug=False)
    return settings, params, w, h


def test_adapter_matches_functional(rng):
    scene = make_scene(rng, n=300)
    settings, params, w, h = _settings_and_camera()
    r = GaussianRasterizer(settings)
    args = {k: jnp.asarray(scene[k]) for k in
            ("xyz", "scales", "rotations", "opacities", "colors")}
    color, radii, acc = r(args["xyz"], jnp.zeros((300, 2)), args["opacities"],
                          colors_precomp=args["colors"],
                          scales=args["scales"], rotations=args["rotations"])
    want = rasterize_gaussians(args["xyz"], args["scales"], args["rotations"],
                               args["opacities"], args["colors"], params, w, h,
                               kernel_size=0.1)
    np.testing.assert_allclose(np.asarray(color),
                               np.asarray(want.color).transpose(2, 0, 1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 1.0 - np.asarray(want.final_T),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(radii), np.asarray(want.radii))
    assert color.shape == (3, h, w)


def test_adapter_cov3d_precomp_path(rng):
    scene = make_scene(rng, n=200)
    settings, params, w, h = _settings_and_camera()
    r = GaussianRasterizer(settings)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]),
                          jnp.asarray(scene["rotations"]))
    a = r(jnp.asarray(scene["xyz"]), jnp.zeros((200, 2)),
          jnp.asarray(scene["opacities"]),
          colors_precomp=jnp.asarray(scene["colors"]),
          scales=jnp.asarray(scene["scales"]),
          rotations=jnp.asarray(scene["rotations"]))
    b = r(jnp.asarray(scene["xyz"]), jnp.zeros((200, 2)),
          jnp.asarray(scene["opacities"]),
          colors_precomp=jnp.asarray(scene["colors"]), cov3D_precomp=cov3d)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)


def test_adapter_sh_path(rng):
    scene = make_scene(rng, n=150)
    settings, params, w, h = _settings_and_camera()
    r = GaussianRasterizer(settings)
    K = (settings.sh_degree + 1) ** 2
    shs = jnp.asarray(rng.normal(0, 0.2, (150, K, 3)).astype(np.float32))
    color, radii, acc = r(jnp.asarray(scene["xyz"]), jnp.zeros((150, 2)),
                          jnp.asarray(scene["opacities"]), shs=shs,
                          scales=jnp.asarray(scene["scales"]),
                          rotations=jnp.asarray(scene["rotations"]))
    assert np.isfinite(np.asarray(color)).all()
    # SH eval: manual dc-only check at degree 0
    settings0 = settings._replace(sh_degree=0)
    r0 = GaussianRasterizer(settings0)
    c0, _, _ = r0(jnp.asarray(scene["xyz"]), jnp.zeros((150, 2)),
                  jnp.asarray(scene["opacities"]), shs=shs,
                  scales=jnp.asarray(scene["scales"]),
                  rotations=jnp.asarray(scene["rotations"]))
    C0 = 0.28209479177387814
    colors_dc = jnp.maximum(shs[:, 0, :] * C0 + 0.5, 0.0)
    want = rasterize_gaussians(
        jnp.asarray(scene["xyz"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
        colors_dc, params, w, h, kernel_size=0.1)
    np.testing.assert_allclose(np.asarray(c0),
                               np.asarray(want.color).transpose(2, 0, 1),
                               atol=1e-5)


def test_adapter_means2d_hook_grads(rng):
    scene = make_scene(rng, n=100)
    settings, params, w, h = _settings_and_camera()
    r = GaussianRasterizer(settings)
    target = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))

    def loss(means2d):
        color, _, _ = r(jnp.asarray(scene["xyz"]), means2d,
                        jnp.asarray(scene["opacities"]),
                        colors_precomp=jnp.asarray(scene["colors"]),
                        scales=jnp.asarray(scene["scales"]),
                        rotations=jnp.asarray(scene["rotations"]))
        return jnp.mean((color - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((100, 2), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_adapter_mark_visible(rng):
    settings, params, w, h = _settings_and_camera()
    r = GaussianRasterizer(settings)
    pts = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0], [0.0, 0.0, 0.1]],
                      jnp.float32)
    vis = np.asarray(r.markVisible(pts))
    assert vis.tolist() == [True, False, False]


def test_adapter_argument_validation(rng):
    settings, *_ = _settings_and_camera()
    r = GaussianRasterizer(settings)
    z = jnp.zeros((4, 3))
    with pytest.raises(ValueError):
        r(z, jnp.zeros((4, 2)), jnp.zeros((4,)))  # neither shs nor colors
    with pytest.raises(ValueError):
        r(z, jnp.zeros((4, 2)), jnp.zeros((4,)),
          colors_precomp=z, shs=jnp.zeros((4, 4, 3)),
          scales=z, rotations=jnp.zeros((4, 4)))
