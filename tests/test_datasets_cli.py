"""Dataset loaders + full CLI train run on a synthetic on-disk COLMAP scene."""
import json
import os
import sys

import numpy as np
import pytest

from wildgaussians_tpu.datasets.colmap_utils import (
    Camera, Image, Point3D, qvec2rotmat, rotmat2qvec,
    read_cameras_binary, read_images_binary, read_points3D_binary,
    write_cameras_binary, write_images_binary, write_points3D_binary)


def make_colmap_scene(tmp_path, rng, n_cams=10, n_points=400, width=64, height=48):
    """Write a synthetic COLMAP dataset: oracle renders become photos."""
    import jax.numpy as jnp
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
    from wildgaussians_tpu.types import new_cameras
    from helpers import make_scene
    from PIL import Image as PILImage

    scene = make_scene(rng, n=n_points, spread=1.5, z_range=(3.0, 7.0))
    f = width / (2 * np.tan(np.radians(50.0) / 2))
    sparse = tmp_path / "sparse"
    images_dir = tmp_path / "images"
    sparse.mkdir(parents=True)
    images_dir.mkdir()

    cameras = {1: Camera(1, "PINHOLE", width, height,
                         np.array([f, f, width / 2, height / 2]))}
    write_cameras_binary(cameras, sparse / "cameras.bin")

    images = {}
    for i in range(n_cams):
        angle = (i - n_cams / 2) * 0.06
        c, s = np.cos(angle * 0.5), np.sin(angle * 0.5)
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float64)
        c2w = np.eye(4)
        c2w[:3, :3] = rot
        c2w[0, 3] = np.sin(angle) * 3.0
        w2c = np.linalg.inv(c2w)
        qvec = rotmat2qvec(w2c[:3, :3])
        tvec = w2c[:3, 3]
        name = f"{i:03d}.png"
        images[i + 1] = Image(i + 1, qvec, tvec, 1, name,
                              np.zeros((0, 2)), np.zeros((0,), np.int64))
        # render "photo"
        cam = new_cameras(
            poses=c2w[:3].astype(np.float32)[None],
            intrinsics=np.array([[f, f, width / 2, height / 2]], np.float32),
            camera_models=np.zeros((1,), np.int32),
            distortion_parameters=np.zeros((1, 6), np.float32),
            image_sizes=np.array([[width, height]], np.int32))
        params, w, h = wc.make_camera_params(cam)
        out = rasterize_gaussians(
            jnp.asarray(scene["xyz"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
            jnp.asarray(scene["colors"]), params, w, h,
            kernel_size=0.1, backend="tiled")
        img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        PILImage.fromarray(img).save(images_dir / name)
    write_images_binary(images, sparse / "images.bin")

    points = {}
    noisy = scene["xyz"] + rng.normal(0, 0.03, scene["xyz"].shape).astype(np.float32)
    for i in range(n_points):
        points[i + 1] = Point3D(i + 1, noisy[i].astype(np.float64),
                                (scene["colors"][i] * 255).astype(np.uint8), 0.5,
                                np.zeros((0,), np.int32), np.zeros((0,), np.int32))
    write_points3D_binary(points, sparse / "points3D.bin")
    return tmp_path


def test_colmap_roundtrip(tmp_path, rng):
    p = make_colmap_scene(tmp_path, rng, n_cams=3, n_points=20)
    cams = read_cameras_binary(p / "sparse" / "cameras.bin")
    assert cams[1].model == "PINHOLE"
    imgs = read_images_binary(p / "sparse" / "images.bin")
    assert len(imgs) == 3
    pts = read_points3D_binary(p / "sparse" / "points3D.bin")
    assert len(pts) == 20
    # qvec <-> rotmat roundtrip
    q = imgs[1].qvec
    R = qvec2rotmat(q)
    np.testing.assert_allclose(rotmat2qvec(R), q / np.sign(q[0]), atol=1e-6)


def test_colmap_text_model_roundtrip(tmp_path, rng):
    """write_model(.txt) -> read_model auto-detect -> identical model; and a
    .txt model loads through load_colmap_dataset like a .bin one."""
    from wildgaussians_tpu.datasets.colmap_utils import (
        detect_model_format, read_model, write_model)
    p = make_colmap_scene(tmp_path, rng, n_cams=3, n_points=20)
    cams, imgs, pts = read_model(p / "sparse")  # auto-detect .bin
    txt = tmp_path / "txt"
    txt.mkdir()
    write_model(cams, imgs, pts, txt, ext=".txt")
    assert detect_model_format(txt, ".txt") and not detect_model_format(txt, ".bin")
    cams2, imgs2, pts2 = read_model(txt)  # auto-detect .txt
    assert cams2.keys() == cams.keys() and imgs2.keys() == imgs.keys()
    for k in cams:
        assert cams2[k].model == cams[k].model
        np.testing.assert_array_equal(cams2[k].params, cams[k].params)
    for k in imgs:
        np.testing.assert_array_equal(imgs2[k].qvec, imgs[k].qvec)
        np.testing.assert_array_equal(imgs2[k].tvec, imgs[k].tvec)
        assert imgs2[k].name == imgs[k].name
    for k in pts:
        np.testing.assert_array_equal(pts2[k].xyz, pts[k].xyz)
        np.testing.assert_array_equal(pts2[k].rgb, pts[k].rgb)
    # bin roundtrip through write_model too
    binp = tmp_path / "bin2"
    binp.mkdir()
    write_model(cams, imgs, pts, binp, ext=".bin")
    cams3, _, _ = read_model(binp, ext=".bin")
    np.testing.assert_array_equal(cams3[1].params, cams[1].params)


def test_load_colmap_dataset(tmp_path, rng):
    from wildgaussians_tpu.datasets.colmap import load_colmap_dataset
    from wildgaussians_tpu.datasets import dataset_load_features
    p = make_colmap_scene(tmp_path, rng, n_cams=9, n_points=50)
    train = load_colmap_dataset(p, split="train",
                                features=frozenset(("points3D_xyz", "points3D_rgb")))
    test = load_colmap_dataset(p, split="test",
                               features=frozenset(("points3D_xyz", "points3D_rgb")))
    # LLFF hold: every 8th is test
    assert len(test["image_paths"]) == 2  # indices 0 and 8 of 9
    assert len(train["image_paths"]) == 7
    assert train["points3D_xyz"].shape == (50, 3)
    train = dataset_load_features(train)
    assert train["images"][0].shape == (48, 64, 3)
    assert train["cameras"].poses.shape == (7, 3, 4)


def test_horizontal_half_dataset(tmp_path, rng):
    from wildgaussians_tpu.datasets.colmap import load_colmap_dataset
    from wildgaussians_tpu.datasets import dataset_load_features, dataset_index_select
    from wildgaussians_tpu.datasets.phototourism import horizontal_half_dataset
    p = make_colmap_scene(tmp_path, rng, n_cams=3, n_points=30)
    ds = dataset_load_features(load_colmap_dataset(
        p, split=None, features=frozenset(("points3D_xyz", "points3D_rgb"))))
    ds1 = dataset_index_select(ds, [0])
    left = horizontal_half_dataset(ds1, left=True)
    right = horizontal_half_dataset(ds1, left=False)
    w = ds1["cameras"].image_sizes[0][0]
    assert left["cameras"].image_sizes[0][0] + right["cameras"].image_sizes[0][0] == w
    assert left["images"][0].shape[1] == left["cameras"].image_sizes[0][0]
    # right half keeps fx but shifts cx
    np.testing.assert_allclose(
        right["cameras"].intrinsics[:, 2],
        ds1["cameras"].intrinsics[:, 2] - right["cameras"].image_sizes[:, 0])


@pytest.mark.slow
def test_cli_debug_train(tmp_path, rng):
    """Full CLI path: loaders -> train 100 iters -> eval-few -> eval-all."""
    from click.testing import CliRunner
    from wildgaussians_tpu.train import train_command
    data = make_colmap_scene(tmp_path / "data", rng, n_cams=9, n_points=100)
    out = tmp_path / "out"
    runner = CliRunner()
    result = runner.invoke(train_command, [
        "--data", str(data), "--output", str(out), "--debug",
        "--set", "uncertainty_mode=disabled",
        "--set", "appearance_enabled=false",
        "--set", "num_sky_gaussians=0",
        "--set", "sh_degree=1",
        "--set", "densify_from_iter=30",
        "--set", "densification_interval=50",
        "--set", "densify_until_iter=90",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert (out / "checkpoint-100").exists()
    assert (out / "predictions-100.tar.gz").exists()
    with open(out / "results-100.json", encoding="utf8") as fh:
        results = json.load(fh)
    assert np.isfinite(results["metrics"]["psnr"])
    assert results["metrics"]["psnr"] > 10


def test_cli_debug_snapshot_on_nonfinite(tmp_path, rng, monkeypatch):
    """--debug dumps the replayable PRE-step state when a step goes
    non-finite (the reference rasterizer's debug-pickle analogue)."""
    from click.testing import CliRunner
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    from wildgaussians_tpu.train import train_command

    data = make_colmap_scene(tmp_path / "data", rng, n_cams=4, n_points=60)
    out = tmp_path / "out"
    orig = WildGaussians.train_iteration

    def poisoned(self, step):
        metrics = orig(self, step)
        if step == 3:
            metrics["loss"] = float("nan")
        return metrics

    monkeypatch.setattr(WildGaussians, "train_iteration", poisoned)
    runner = CliRunner()
    result = runner.invoke(train_command, [
        "--data", str(data), "--output", str(out), "--debug",
        "--set", "uncertainty_mode=disabled",
        "--set", "appearance_enabled=false",
        "--set", "num_sky_gaussians=0",
        "--set", "sh_degree=1",
    ], catch_exceptions=True)
    assert result.exit_code != 0
    assert isinstance(result.exception, RuntimeError)
    assert "non-finite loss at step 3" in str(result.exception)
    snap = out / "debug-snapshot-3.npz"
    assert snap.exists()
    state = np.load(str(snap))
    assert "params/xyz" in state
    with open(out / "debug-snapshot-3.json", encoding="utf8") as fh:
        info = json.load(fh)
    assert info["step"] == 3 and info["camera_id"] is not None
