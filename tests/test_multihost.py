"""Multi-host skeleton: deterministic camera picks, band math, a
collectives audit of the sharded program (single-process, 8-dev CPU mesh),
and a REAL 2-process jax.distributed training run (gloo collectives)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.parallel import multihost as mh


def test_init_single_process_noop():
    assert mh.init_multihost() is False
    assert jax.process_count() == 1


def test_step_camera_id_is_epoch_permutation():
    n = 7
    for epoch in range(3):
        ids = [mh.step_camera_id(epoch * n + i, n) for i in range(n)]
        assert sorted(ids) == list(range(n))
    # deterministic across "hosts" (same inputs -> same pick)
    assert mh.step_camera_id(13, n) == mh.step_camera_id(13, n)


def test_host_tile_rows_single_process():
    r0, r1 = mh.host_tile_rows(96)
    assert (r0, r1) == (0, 96)


def _sharded_grad_hlo(rng, binning):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh

    scene = make_scene(rng, n=200)
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
    target = jnp.zeros((h, w, 3), jnp.float32)
    mesh = make_tile_mesh(jax.devices()[:8])

    def loss(m2d, con, op, col):
        ((img, _t),) = rasterize_pallas_multi(
            m2d, con, op, [col], jnp.zeros((n, 2)), *geo, bg, grid=grid,
            max_tiles_per_gaussian=6, d_small=6, mesh=mesh, binning=binning)
        return jnp.mean((img - target) ** 2)

    lowered = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))).lower(
        pre.mean2d, pre.conic, pre.opacity, colors)
    return lowered.compile().as_text()


def _assert_no_large_allgather(hlo):
    # no LARGE all-gather: neither engine may re-gather entry tables or
    # Gaussian tensors (XLA may gather tiny scalar-level values, e.g. the
    # bucket_ranges cumsum — s32[1,16] — which is fine)
    import re
    for line in hlo.splitlines():
        m = re.search(r"=\s+\w+\[([\d,]*)\][^=]*all-gather", line)
        if m and m.group(1):
            numel = int(np.prod([int(x) for x in m.group(1).split(",")]))
            assert numel < 16384, f"large all-gather in sharded program: {line[:160]}"


def test_sharded_program_collectives_partition(rng):
    """The replicated-binning partition path must all-reduce exactly the
    per-rank Gaussian gradient psum — and nothing big besides."""
    hlo = _sharded_grad_hlo(rng, "partition")
    n_allreduce = hlo.count("all-reduce(") + hlo.count("all-reduce-start(")
    assert n_allreduce >= 1, "gradient psum missing from the sharded program"
    assert n_allreduce <= 4, f"unexpected extra collectives: {n_allreduce}"
    _assert_no_large_allgather(hlo)


@pytest.mark.slow
def test_multiprocess_sharded_training():
    """Composition of the multi-host skeleton with the Gaussian-sharded sort
    engine: 2 REAL processes x 4 virtual CPU devices each form one 8-device
    global mesh over gloo, train 3 full steps with all-to-all binning and
    shard-owned gradients, and must (a) agree bit-exactly with each other,
    (b) reproduce the single-process 8-device run of the same steps, and
    (c) address only their own half of the store's shards (1/D memory)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    steps, local_devices = 3, 4
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = ""   # the worker pins cpu itself
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(steps),
         str(local_devices)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=repo,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # (a) both hosts computed the identical global program
    assert outs[0]["losses"] == outs[1]["losses"], outs
    assert all(np.isfinite(l) for l in outs[0]["losses"])
    # (c) global store, locally-addressed half
    for o in outs:
        assert o["n_dev_global"] == 2 * local_devices
        assert o["n_dev_local"] == local_devices
        assert o["n_shards_total"] == 2 * local_devices
        assert o["n_shards_addressable"] == local_devices

    # (b) single-process 8-device run of the SAME steps (same deterministic
    # camera picks) reproduces the multi-process losses
    from __graft_entry__ import _OVERRIDES, _synthetic_setup
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh, use_mesh
    overrides = dict(_OVERRIDES)
    overrides.update(sh_degree=1, rasterizer_backend="pallas",
                     pallas_binning="sort", shard_gaussian_store=True,
                     pallas_big_fraction=1.0)
    dataset = _synthetic_setup(n_gaussians=512, width=64, height=48, n_cams=2)
    method = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    mesh = make_tile_mesh(jax.devices()[:8])
    with use_mesh(mesh):
        ref = [float(method.train_iteration(
            s, camera_id=mh.step_camera_id(s, 2))["loss"])
            for s in range(steps)]
    np.testing.assert_allclose(outs[0]["losses"], ref, rtol=1e-6)


def test_sharded_program_collectives_sort(rng):
    """The Gaussian-sharded sort engine's only bulk collective is the
    entry all-to-all (one each way); Gaussian gradients stay shard-owned,
    so there must be NO large all-reduce (only the tiny bg-grad psum may
    survive when bg is differentiated — here it is not)."""
    hlo = _sharded_grad_hlo(rng, "sort")
    n_a2a = hlo.count("all-to-all(") + hlo.count("all-to-all-start(")
    assert n_a2a >= 2, f"expected fwd+bwd entry all-to-all, got {n_a2a}"
    import re
    for line in hlo.splitlines():
        m = re.search(r"=\s+\w+\[([\d,]*)\][^=]*all-reduce", line)
        if m and m.group(1):
            numel = int(np.prod([int(x) for x in m.group(1).split(",")]))
            assert numel < 16384, \
                f"large all-reduce in gaussian-sharded program: {line[:160]}"
    _assert_no_large_allgather(hlo)
