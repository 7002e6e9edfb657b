"""Evaluation metrics, protocols, serialization, trajectories, loggers."""
import json
import os

import numpy as np
import pytest

from wildgaussians_tpu import evaluation as ev
from wildgaussians_tpu.utils import Indices


def test_dmpix_ssim_identity(rng):
    img = rng.uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    assert ev.dmpix_ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape).astype(np.float32), 0, 1)
    v = float(ev.dmpix_ssim(img, noisy))
    assert 0 < v < 1


def test_jax_ssim_close_to_numpy_eval_ssim(rng):
    """Training SSIM (zero-pad) and eval SSIM (valid) agree in the interior."""
    import jax.numpy as jnp
    from wildgaussians_tpu.ops.ssim import ssim as jssim
    a = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    m_train = np.asarray(jssim(jnp.asarray(a), jnp.asarray(b), size_average=False))
    m_eval = ev.dmpix_ssim.__wrapped__(a[None], b[None], return_map=True)[0].mean(-1)
    # interior (valid region) of the zero-pad map vs the valid-mode map
    np.testing.assert_allclose(m_train[5:-5, 5:-5], m_eval, atol=2e-3)


def test_compute_metrics_psnr(rng):
    gt = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    noisy = np.clip(gt + 0.1, 0, 1).astype(np.float32)
    m = ev.compute_metrics(noisy[None], gt[None])
    assert m["psnr"] == pytest.approx(-10 * np.log10(np.mean((noisy - gt) ** 2)), abs=0.2)
    assert 0 < m["ssim"] <= 1
    assert m["mae"] > 0


def test_metrics_serialization_roundtrip(tmp_path):
    metrics = {"psnr": 25.0, "ssim": 0.8}
    lists = {"psnr": [24.0, 26.0], "ssim": [0.7, 0.9]}
    out = ev.save_evaluation_results(str(tmp_path / "r.json"), metrics, lists,
                                     "default", {"method": "x"})
    with open(tmp_path / "r.json", encoding="utf8") as f:
        data = json.load(f)
    assert data["metrics"]["psnr"] == 25.0
    import base64, struct
    raw = base64.b64decode(data["metrics_raw"]["psnr"])
    vals = struct.unpack("2f", raw)
    assert vals == (24.0, 26.0)


def test_trajectory_get_cameras():
    tr = {
        "camera_model": "pinhole",
        "image_size": (64, 48),
        "fps": 30.0,
        "frames": [
            {"pose": np.eye(4, dtype=np.float32)[:3],
             "intrinsics": np.array([50, 50, 32, 24], np.float32)}
            for _ in range(5)
        ],
    }
    cams = ev.trajectory_get_cameras(tr)
    assert len(cams) == 5
    assert tuple(cams.image_sizes[0]) == (64, 48)


def test_indices():
    idx = Indices.every_iters(100)
    assert 100 in idx and 200 in idx and 150 not in idx
    idx2 = Indices([5, 10])
    assert 5 in idx2 and 7 not in idx2


def test_jsonl_logger(tmp_path, rng):
    from wildgaussians_tpu.logging import JsonlLogger
    lg = JsonlLogger(str(tmp_path))
    lg.add_scalar("train/loss", 0.5, 10)
    with lg.add_event(20) as ev_:
        ev_.add_scalar("a", 1.0)
        ev_.add_image("img", rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    lines = [json.loads(x) for x in
             open(tmp_path / "events.jsonl", encoding="utf8")]
    assert lines[0]["tag"] == "train/loss"
    assert any(line["type"] == "image" for line in lines)
    assert os.path.exists(tmp_path / lines[-1]["path"])


def test_tensorboard_logger(tmp_path, rng):
    from wildgaussians_tpu.logging import TensorboardLogger
    lg = TensorboardLogger(str(tmp_path))
    lg.add_scalar("x", 1.0, 1)
    lg.add_image("img", rng.uniform(0, 1, (8, 8, 3)).astype(np.float32), 1)
    lg.add_histogram("h", rng.normal(size=100), 1)
    lg._writer.flush()
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_render_frames_smoke(tmp_path):
    """render_frames drives a fake Method through every output sink: a PNG
    directory, and (when mediapy+ffmpeg exist in the env) .mp4 and .gif
    (reference evaluation.py:517-575)."""
    import pytest

    class FakeMethod:
        def render(self, camera, *, options=None):
            w, h = camera.image_sizes
            img = np.linspace(0, 1, h * w * 3, dtype=np.float32)
            return {"color": img.reshape(h, w, 3)}

    tr = {
        "camera_model": "pinhole",
        "image_size": (32, 16),
        "fps": 5.0,
        "frames": [
            {"pose": np.eye(4, dtype=np.float32)[:3],
             "intrinsics": np.array([20, 20, 16, 8], np.float32)}
            for _ in range(3)
        ],
    }
    cams = ev.trajectory_get_cameras(tr)
    ev.render_frames(FakeMethod(), cams, tmp_path / "frames", fps=5.0)
    assert sorted(p.name for p in (tmp_path / "frames").iterdir()) == [
        "00000.png", "00001.png", "00002.png"]

    try:
        import mediapy  # noqa: F401
    except ImportError:
        pytest.skip("mediapy not in environment (video sinks gated)")
    for ext in (".mp4", ".gif"):
        out = tmp_path / f"vid{ext}"
        try:
            ev.render_frames(FakeMethod(), cams, out, fps=5.0)
        except RuntimeError as e:
            pytest.skip(f"video backend unavailable: {e}")
        assert out.exists() and out.stat().st_size > 0
