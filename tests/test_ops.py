"""Unit tests for SH eval, preprocess math, and the oracle rasterizer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.ops import sh as sh_ops
from wildgaussians_tpu.ops.gaussians import (
    quat_to_rotmat, compute_cov3d, compute_cov2d, apply_3d_filter,
)
from wildgaussians_tpu.ops.rasterize_reference import rasterize_reference

from helpers import make_camera, make_scene, numpy_sequential_rasterize, preprocess_scene


def scipy_sh_reference(deg, sh, dirs):
    """Independent SH eval via the same polynomials, written differently."""
    # Use the reference's numpy-compatible eval (method.py:493-548) re-derived:
    from wildgaussians_tpu.ops.sh import C0, C1, C2, C3
    x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
    res = C0 * sh[..., 0]
    if deg >= 1:
        res = res - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        res = (res + C2[0] * x * y * sh[..., 4] + C2[1] * y * z * sh[..., 5]
               + C2[2] * (2 * zz - xx - yy) * sh[..., 6]
               + C2[3] * x * z * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
    if deg >= 3:
        xx, yy, zz = x * x, y * y, z * z
        res = (res + C3[0] * y * (3 * xx - yy) * sh[..., 9]
               + C3[1] * x * y * z * sh[..., 10]
               + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
               + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
               + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
               + C3[5] * z * (xx - yy) * sh[..., 14]
               + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return res


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_sh(rng, deg):
    n = 64
    sh = rng.normal(size=(n, 3, 16)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(sh_ops.eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
    want = scipy_sh_reference(deg, sh, dirs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_eval_sh_switch_matches_static(rng):
    n = 32
    sh = rng.normal(size=(n, 3, 16)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for d in range(4):
        got = sh_ops.eval_sh_switch(jnp.int32(d), 3, jnp.asarray(sh), jnp.asarray(dirs))
        want = sh_ops.eval_sh(d, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_quat_to_rotmat_orthonormal(rng):
    q = rng.normal(size=(100, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (100, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(100), atol=1e-5)
    # identity quaternion -> identity matrix
    RI = np.asarray(quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(RI[0], np.eye(3), atol=1e-7)


def test_cov3d_matches_explicit(rng):
    q = rng.normal(size=(50, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.uniform(-2, 0, (50, 3))).astype(np.float32)
    packed = np.asarray(compute_cov3d(jnp.asarray(s), jnp.asarray(q)))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    sigma = np.einsum("nij,nj,nkj->nik", R, s**2, R)
    want = np.stack([sigma[:, 0, 0], sigma[:, 0, 1], sigma[:, 0, 2],
                     sigma[:, 1, 1], sigma[:, 1, 2], sigma[:, 2, 2]], axis=-1)
    np.testing.assert_allclose(packed, want, rtol=1e-4, atol=1e-6)


def test_cov2d_positive_definite_and_dilated(rng):
    scene = make_scene(rng, n=200)
    cam = make_camera()
    pre, params, w, h = preprocess_scene(scene, cam, kernel_size=0.1)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]), jnp.asarray(scene["rotations"]))
    cov2d, coef = compute_cov2d(jnp.asarray(scene["xyz"]), cov3d, params, 0.1)
    cov2d, coef = np.asarray(cov2d), np.asarray(coef)
    # after +0.1 dilation diagonals exceed 0.1 and det > 0
    assert (cov2d[:, 0] > 0.1 - 1e-5).all()
    assert (cov2d[:, 2] > 0.1 - 1e-5).all()
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    assert (det > 0).all()
    assert (coef >= 0).all() and (coef <= 1.0 + 1e-5).all()


def test_apply_3d_filter_zero_filter_is_identity(rng):
    s = np.exp(rng.uniform(-2, 0, (10, 3))).astype(np.float32)
    o = rng.uniform(0.1, 1, (10, 1)).astype(np.float32)
    f = np.zeros((10, 1), np.float32)
    s2, o2 = apply_3d_filter(jnp.asarray(s), jnp.asarray(o), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(s2), s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o2), o, rtol=1e-6)


def test_preprocess_culls_behind_camera(rng):
    scene = make_scene(rng, n=50)
    scene["xyz"][:25, 2] = -5.0  # behind camera
    cam = make_camera()
    pre, *_ = preprocess_scene(scene, cam)
    valid = np.asarray(pre.valid)
    assert not valid[:25].any()
    assert np.asarray(pre.radius)[:25].max() == 0


def test_oracle_matches_sequential_loop(rng):
    scene = make_scene(rng, n=300)
    cam = make_camera(width=64, height=48)
    pre, params, w, h = preprocess_scene(scene, cam)
    colors = scene["colors"]
    args = [np.asarray(x) for x in
            (pre.mean2d, pre.depth, pre.conic, pre.opacity)]
    valid = np.asarray(pre.valid)
    rmin, rmax = np.asarray(pre.rect_min), np.asarray(pre.rect_max)

    want_c, want_t = numpy_sequential_rasterize(
        args[0], args[1], args[2], args[3], colors, valid, rmin, rmax, w, h)
    got_c, got_t = rasterize_reference(
        pre.mean2d, pre.depth, pre.conic, pre.opacity, jnp.asarray(colors),
        pre.valid, pre.rect_min, pre.rect_max, width=w, height=h)
    np.testing.assert_allclose(np.asarray(got_c), want_c, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=2e-3, rtol=1e-3)


def test_oracle_background(rng):
    scene = make_scene(rng, n=10)
    cam = make_camera(width=32, height=32)
    pre, params, w, h = preprocess_scene(scene, cam)
    bg = jnp.asarray([1.0, 0.5, 0.25])
    got_c, got_t = rasterize_reference(
        pre.mean2d, pre.depth, pre.conic, pre.opacity, jnp.asarray(scene["colors"]),
        pre.valid, pre.rect_min, pre.rect_max, width=w, height=h, bg=bg)
    # where nothing rendered, color == bg
    t = np.asarray(got_t)
    c = np.asarray(got_c)
    empty = t > 0.999999
    assert empty.any()
    np.testing.assert_allclose(c[empty], np.broadcast_to(np.asarray(bg), c[empty].shape), atol=1e-5)


def test_oracle_grads_finite(rng):
    """AD through the oracle produces finite grads for all inputs."""
    scene = make_scene(rng, n=64)
    cam = make_camera(width=32, height=24)
    pre, params, w, h = preprocess_scene(scene, cam)
    target = jnp.zeros((h, w, 3))

    def loss_fn(mean2d, conic, opacity, colors):
        c, _ = rasterize_reference(mean2d, pre.depth, conic, opacity, colors,
                                   pre.valid, pre.rect_min, pre.rect_max,
                                   width=w, height=h)
        return jnp.mean((c - target) ** 2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        pre.mean2d, pre.conic, pre.opacity, jnp.asarray(scene["colors"]))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # color gradient should be nonzero somewhere
    assert np.abs(np.asarray(grads[3])).max() > 0
