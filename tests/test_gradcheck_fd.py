"""Finite-difference gradient check through rasterize_gaussians.

Validates the shared preprocess/compute_cov2d VJP (reference math at
backward.cu:144-310,382-432) independently of JAX AD: every other test
derives gradients through JAX's AD of the same preprocess code, so an
analytic bug there would cancel out. Central differences on a handful of
parameters close that loop.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
from helpers import make_camera, make_scene


def _loss_fn(params, w, h, target, backend):
    def loss(xyz, scales, rots, opac, colors):
        # pack16=False: finite differences need the exact (non-f16-quantized)
        # payload path — central differences smaller than the quantization
        # step would otherwise measure rounding noise, not the derivative
        out = rasterize_gaussians(xyz, scales, rots, opac, colors,
                                  params, w, h, kernel_size=0.1,
                                  backend=backend, sort_mode="exact",
                                  pack16=False)
        return jnp.mean((out.color - target) ** 2)
    return loss


@pytest.mark.parametrize("backend", ["tiled", "pallas"])
def test_finite_difference_gradcheck(rng, backend):
    scene = make_scene(rng, n=60)
    cam = make_camera(width=48, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    loss = _loss_fn(params, w, h, target, backend)
    args = [jnp.asarray(scene[k], jnp.float32) for k in
            ("xyz", "scales", "rotations", "opacities", "colors")]
    loss64 = lambda *a: float(loss(*a))  # noqa: E731

    grads = jax.grad(loss, argnums=tuple(range(5)))(*args)

    # central differences on a sample of coordinates per parameter tensor.
    # The render is only piecewise smooth (ceil'd radii, 1/255 alpha floor,
    # tile-rect boundaries), so individual coordinates can straddle a kink;
    # require the BULK to match tightly — a systematic VJP error (wrong
    # factor, missing term) would shift every coordinate.
    names = ["xyz", "scales", "rotations", "opacities", "colors"]
    rel_errs = []
    for ai, name in enumerate(names):
        eps = 1e-3
        g = np.asarray(grads[ai])
        flat = np.asarray(args[ai]).reshape(-1)
        # pick the highest-|grad| coordinates: their FD signal is cleanest
        order = np.argsort(-np.abs(g).reshape(-1))[:4]
        for idx in order:
            if abs(g.reshape(-1)[idx]) < 1e-6:
                continue
            pert = flat.copy()
            pert[idx] += eps
            a_plus = args.copy()
            a_plus[ai] = jnp.asarray(pert.reshape(np.asarray(args[ai]).shape))
            pert2 = flat.copy()
            pert2[idx] -= eps
            a_minus = args.copy()
            a_minus[ai] = jnp.asarray(pert2.reshape(np.asarray(args[ai]).shape))
            fd = (loss64(*a_plus) - loss64(*a_minus)) / (2 * eps)
            an = float(g.reshape(-1)[idx])
            denom = max(abs(fd), abs(an), 1e-5)
            rel_errs.append((abs(fd - an) / denom, name, idx, an, fd))
    assert len(rel_errs) >= 15, f"only {len(rel_errs)} coordinates checked"
    errs = np.array([e[0] for e in rel_errs])
    # no coordinate wildly off (sign flips / factor errors), most are tight
    worst = max(rel_errs, key=lambda e: e[0])
    assert errs.max() < 0.5, f"worst: {worst}"
    assert np.median(errs) < 0.02, f"median {np.median(errs):.3f}; worst {worst}"
    assert (errs < 0.08).mean() >= 0.75, f"{(errs < 0.08).mean():.2f} within 8%"
