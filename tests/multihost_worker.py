"""Worker process for the REAL multi-process composition test.

Launched (2x) by tests/test_multihost.py::test_multiprocess_sharded_training.
Each worker owns 4 virtual CPU devices and joins a 2-process
jax.distributed cluster (gloo collectives), forming one 8-device global
('tiles',) mesh — the same topology a 2-host TPU slice presents. It then
trains the flagship model for a few steps with the PRODUCTION
Gaussian-sharded sort engine (all-to-all binning, shard-owned gradients)
and prints one JSON line with the per-step losses and sharding facts.

The reference has no multi-process story at all (single GPU pinned,
reference method.py:113-117); this is the TPU-native scaling path of
SURVEY.md section 2.3/5.
"""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = int(sys.argv[3])
    steps = int(sys.argv[4])
    local_devices = int(sys.argv[5])

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from wildgaussians_tpu.parallel import multihost as mh
    assert mh.init_multihost(coordinator_address=f"localhost:{port}",
                             num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc

    from __graft_entry__ import _OVERRIDES, _synthetic_setup
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    from wildgaussians_tpu.parallel.mesh import use_mesh

    mesh = mh.global_tile_mesh()
    overrides = dict(_OVERRIDES)
    overrides.update(sh_degree=1, rasterizer_backend="pallas",
                     pallas_binning="sort", shard_gaussian_store=True,
                     pallas_big_fraction=1.0)
    dataset = _synthetic_setup(n_gaussians=512, width=64, height=48, n_cams=2)
    method = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    losses = []
    with use_mesh(mesh):
        for step in range(steps):
            cam_id = mh.step_camera_id(step, 2)
            metrics = method.train_iteration(step, camera_id=cam_id)
            losses.append(float(metrics["loss"]))
    xyz = method.params["xyz"]
    print(json.dumps({
        "pid": pid,
        "losses": losses,
        "n_dev_global": len(jax.devices()),
        "n_dev_local": len(jax.local_devices()),
        # the store must be GLOBALLY sharded: this host addresses only its
        # own 1/n_proc of the shards (1/D memory per device)
        "n_shards_addressable": len(xyz.sharding.addressable_devices),
        "n_shards_total": len(xyz.sharding.device_set),
    }), flush=True)


if __name__ == "__main__":
    main()
