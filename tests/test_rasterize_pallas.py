"""Pallas kernels vs tiled backend (interpret mode on CPU; same kernels
compile natively on TPU — see the TPU drive in .claude/skills/verify)."""
import numpy as np
import jax
import jax.numpy as jnp

from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
from helpers import make_camera, make_scene


def _args(scene):
    return tuple(jnp.asarray(scene[k])
                 for k in ("xyz", "scales", "rotations", "opacities", "colors"))


def test_pallas_matches_tiled_forward(rng):
    scene = make_scene(rng, n=200)
    cam = make_camera(width=48, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    ref = rasterize_gaussians(*_args(scene), params, w, h, kernel_size=0.1,
                              backend="tiled")
    got = rasterize_gaussians(*_args(scene), params, w, h, kernel_size=0.1,
                              backend="pallas")
    np.testing.assert_allclose(np.asarray(got.color), np.asarray(ref.color),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.final_T), np.asarray(ref.final_T),
                               atol=5e-3, rtol=1e-3)


def test_pallas_grads_match_tiled(rng):
    scene = make_scene(rng, n=120)
    cam = make_camera(width=32, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss(backend, *a):
        out = rasterize_gaussians(*a, params, w, h, kernel_size=0.1,
                                  backend=backend)
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.final_T)

    args = _args(scene)
    g_ref = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)
    for name, gr, gp in zip(("xyz", "scales", "rot", "opac", "col"), g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-12
        np.testing.assert_allclose(gp, gr, atol=5e-3 * scale, rtol=5e-2,
                                   err_msg=f"grad mismatch for {name}")
