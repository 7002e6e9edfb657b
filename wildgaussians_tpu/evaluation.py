"""Metrics, evaluation protocols, prediction rendering/archiving.

Mirrors reference wildgaussians/evaluation.py. The SSIM here matches dm_pix
exactly (valid-mode separable Gaussian, covariance clipping); LPIPS uses the
torch (CPU) backbones when pretrained weights are available locally and
degrades to NaN with a warning otherwise (this environment has no egress).
"""
import base64
import contextlib
import io
import json
import logging
import os
import struct
import tarfile
import time
import typing
import warnings
from datetime import datetime
from functools import wraps
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional, Union, cast

import numpy as np

from .datasets import dataset_index_select, new_dataset
from .types import (Cameras, Dataset, EvaluationProtocol, Literal, Method,
                    RenderOutput, Trajectory, camera_model_to_int, new_cameras)
from .utils import (convert_image_dtype, image_to_srgb, read_image, save_image,
                    serialize_nb_info, save_depth, visualize_depth,
                    open_any_directory)

logger = logging.getLogger(__name__)
OutputType = Literal["color", "depth"]


def assert_not_none(x):
    assert x is not None, "value must not be None"
    return x


def _wrap_metric_arbitrary_shape(fn):
    @wraps(fn)
    def wrapped(a, b, **kwargs):
        bs = a.shape[:-3]
        a = np.reshape(a, (-1, *a.shape[-3:]))
        b = np.reshape(b, (-1, *b.shape[-3:]))
        out = fn(a, b, **kwargs)
        return np.reshape(out, bs)
    return wrapped


@_wrap_metric_arbitrary_shape
def dmpix_ssim(a: np.ndarray, b: np.ndarray, *, max_val: float = 1.0,
               kernel_size: int = 11, sigma: float = 1.5, k1: float = 0.01,
               k2: float = 0.03, return_map: bool = False,
               filter_fn: Optional[Callable] = None) -> np.ndarray:
    """SSIM exactly matching dm_pix.ssim (reference evaluation.py:68-178):
    separable VALID-mode Gaussian filtering + variance/covariance clipping."""
    assert a.shape == b.shape, f"Images must have the same shape, got {a.shape} and {b.shape}"
    assert a.dtype.kind == "f" and b.dtype.kind == "f"

    if filter_fn is None:
        hw = kernel_size // 2
        shift = (2 * hw - kernel_size + 1) / 2
        f_i = ((np.arange(kernel_size) - hw + shift) / sigma) ** 2
        filt = np.exp(-0.5 * f_i)
        filt /= np.sum(filt)

        def conv_axis(z, axis):
            z = np.moveaxis(z, axis, -1)
            shape = z.shape
            flat = z.reshape(-1, shape[-1])
            out = np.stack([np.convolve(row, filt, mode="valid") for row in flat], 0)
            return np.moveaxis(out.reshape(*shape[:-1], -1), -1, axis)

        def filter_fn(z):
            return conv_axis(conv_axis(z, -2), -3)

    mu0 = filter_fn(a)
    mu1 = filter_fn(b)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = filter_fn(a ** 2) - mu00
    sigma11 = filter_fn(b ** 2) - mu11
    sigma01 = filter_fn(a * b) - mu01
    epsilon = np.finfo(np.float32).eps ** 2
    sigma00 = np.maximum(epsilon, sigma00)
    sigma11 = np.maximum(epsilon, sigma11)
    sigma01 = np.sign(sigma01) * np.minimum(np.sqrt(sigma00 * sigma11), np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    ssim_value = np.mean(ssim_map, tuple(range(-3, 0)))
    return ssim_map if return_map else ssim_value


def _normalize_input(a):
    return np.clip(a, 0, 1).astype(np.float32)


def _mean(metric):
    return np.mean(metric, (-3, -2, -1))


def ssim(a: np.ndarray, b: np.ndarray):
    """Mean SSIM per image [B] (reference evaluation.py:185-198)."""
    assert a.shape == b.shape
    assert a.dtype.kind == "f" and b.dtype.kind == "f"
    return dmpix_ssim(_normalize_input(a), _normalize_input(b))


def mse(a: np.ndarray, b: np.ndarray):
    assert a.shape == b.shape
    assert a.dtype.kind == "f" and b.dtype.kind == "f"
    return _mean((_normalize_input(a) - _normalize_input(b)) ** 2)


def mae(a: np.ndarray, b: np.ndarray):
    assert a.shape == b.shape
    assert a.dtype.kind == "f" and b.dtype.kind == "f"
    return _mean(np.abs(_normalize_input(a) - _normalize_input(b)))


def psnr(a, b: Optional[np.ndarray] = None):
    mse_value = a if b is None else mse(cast(np.ndarray, a), b)
    return -10 * np.log10(mse_value)


_LPIPS_CACHE: Dict[str, object] = {}
_LPIPS_UNAVAILABLE_WARNED = False


def _lpips(a, b, net, version="0.1"):
    """LPIPS on torch CPU; returns NaN if pretrained weights can't be loaded
    (offline environment). Reference evaluation.py:255-291."""
    global _LPIPS_UNAVAILABLE_WARNED
    assert a.shape == b.shape
    assert a.dtype.kind == "f" and b.dtype.kind == "f"
    try:
        import torch
        lp_net = _LPIPS_CACHE.get(net)
        if lp_net is None:
            from .metrics_lpips import LPIPS
            lp_net = LPIPS(net=net, version=version)
            _LPIPS_CACHE[net] = lp_net
        batch_shape = a.shape[:-3]
        img_shape = a.shape[-3:]
        a = _normalize_input(a)
        b = _normalize_input(b)
        with torch.no_grad():
            ta = torch.from_numpy(a).float().view(-1, *img_shape).permute(0, 3, 1, 2).mul_(2).sub_(1)
            tb = torch.from_numpy(b).float().view(-1, *img_shape).permute(0, 3, 1, 2).mul_(2).sub_(1)
            out = cast("torch.Tensor", lp_net.forward(ta, tb))
            return out.detach().cpu().numpy().reshape(batch_shape)
    except Exception as e:  # pragma: no cover - offline fallback
        if not _LPIPS_UNAVAILABLE_WARNED:
            warnings.warn(f"LPIPS unavailable ({e}); reporting NaN")
            _LPIPS_UNAVAILABLE_WARNED = True
        return np.full(a.shape[:-3], np.nan, np.float32)


def lpips_alex(a, b):
    return _lpips(a, b, net="alex")


def lpips_vgg(a, b):
    return _lpips(a, b, net="vgg")


lpips = lpips_alex


def compute_metrics(pred, gt, *, reduce: bool = True, run_lpips_vgg: bool = False):
    """reference evaluation.py:331-352."""
    def reduction(x):
        return x.mean().item() if reduce else x

    pred = pred[..., : gt.shape[-1]]
    pred = convert_image_dtype(pred, np.float32)
    gt = convert_image_dtype(gt, np.float32)
    mse_ = mse(pred, gt)
    out = {
        "psnr": reduction(psnr(mse_)),
        "ssim": reduction(ssim(gt, pred)),
        "mae": reduction(mae(gt, pred)),
        "mse": reduction(mse_),
        "lpips": reduction(lpips(gt, pred)),
    }
    if run_lpips_vgg:
        out["lpips_vgg"] = reduction(lpips_vgg(gt, pred))
    return out


def evaluate(predictions: str, output: str, *, description: str = "evaluating",
             evaluation_protocol: EvaluationProtocol):
    """Evaluate a predictions dir/tarball (reference evaluation.py:355-434)."""
    if os.path.exists(output):
        raise FileExistsError(f"{output} already exists")

    with open_any_directory(predictions, "r") as _predictions_path:
        predictions_path = Path(_predictions_path)
        with open(predictions_path / "info.json", "r", encoding="utf8") as f:
            nb_info = json.load(f)
        logger.info("Using evaluation protocol %s", evaluation_protocol.get_name())

        metrics_lists = {}
        relpaths = [str(x.relative_to(predictions_path / "color"))
                    for x in (predictions_path / "color").glob("**/*") if x.is_file()]
        relpaths.sort()

        def read_predictions() -> Iterable[RenderOutput]:
            for relname in relpaths:
                yield {"color": read_image(predictions_path / "color" / relname)}

        gt_images = [read_image(predictions_path / "gt-color" / name) for name in relpaths]
        dataset = new_dataset(
            cameras=typing.cast(Cameras, None),
            image_paths=relpaths,
            image_paths_root=str(predictions_path / "color"),
            metadata=typing.cast(Dict, nb_info.get("render_dataset_metadata",
                                                   nb_info.get("dataset_metadata", {}))),
            images=gt_images)

        def collect_metrics_lists():
            for i, pred in enumerate(read_predictions()):
                dataset_slice = dataset_index_select(dataset, [i])
                data = evaluation_protocol.evaluate(pred, dataset_slice)
                for k, v in data.items():
                    metrics_lists.setdefault(k, []).append(v)
                yield data

        metrics = evaluation_protocol.accumulate_metrics(collect_metrics_lists())
        return save_evaluation_results(
            str(output), metrics=metrics, metrics_lists=metrics_lists,
            evaluation_protocol=evaluation_protocol.get_name(), nb_info=nb_info)


class DefaultEvaluationProtocol(EvaluationProtocol):
    """reference evaluation.py:437-469."""
    _name = "default"
    _lpips_vgg = False

    def render(self, method: Method, dataset: Dataset) -> RenderOutput:
        return method.render(dataset["cameras"].item())

    def get_name(self):
        return self._name

    def evaluate(self, predictions: RenderOutput, dataset: Dataset):
        assert len(dataset["images"]) == 1, "Only single image evaluation is supported"
        background_color = dataset["metadata"].get("background_color")
        color_space = dataset["metadata"]["color_space"]
        pred = image_to_srgb(predictions["color"], np.uint8, color_space=color_space,
                             background_color=background_color)
        gt = image_to_srgb(dataset["images"][0], np.uint8, color_space=color_space,
                           background_color=background_color)
        pred_f = convert_image_dtype(pred, np.float32)
        gt_f = convert_image_dtype(gt, np.float32)
        return compute_metrics(pred_f[None], gt_f[None],
                               run_lpips_vgg=self._lpips_vgg, reduce=True)

    def accumulate_metrics(self, metrics: Iterable[Dict[str, Union[float, int]]]):
        acc = {}
        for i, data in enumerate(metrics):
            for k, v in data.items():
                acc[k] = acc.get(k, 0) * (i / (i + 1)) + v / (i + 1)
        return acc


class NerfEvaluationProtocol(DefaultEvaluationProtocol):
    _name = "nerf"
    _lpips_vgg = True


def render_all_images(method: Method, dataset: Dataset, output: str, *,
                      description: str = "rendering all images",
                      nb_info: Optional[dict] = None,
                      evaluation_protocol: EvaluationProtocol) -> Iterable[RenderOutput]:
    """reference evaluation.py:477-514."""
    logger.info("Rendering images with evaluation protocol %s",
                evaluation_protocol.get_name())
    if nb_info is None:
        nb_info = {}
    else:
        nb_info = nb_info.copy()
    nb_info["evaluation_protocol"] = evaluation_protocol.get_name()
    yield from save_predictions(
        output,
        (evaluation_protocol.render(method, dataset_index_select(dataset, [i]))
         for i in range(len(dataset["image_paths"]))),
        dataset=dataset, nb_info=nb_info)


def render_frames(method: Method, cameras: Cameras, output: Union[str, Path],
                  fps: float, embeddings: Optional[List[np.ndarray]] = None,
                  description: str = "rendering frames",
                  output_type: OutputType = "color",
                  nb_info: Optional[dict] = None) -> None:
    """Trajectory video/frames rendering (reference evaluation.py:517-575)."""
    output = Path(output)
    assert cameras.image_sizes is not None
    color_space = "srgb"
    background_color = nb_info.get("background_color") if nb_info else None
    expected_scene_scale = nb_info.get("expected_scene_scale") if nb_info else None

    def _predict_all(allow_transparency=True):
        for i, cam in enumerate(cameras):
            pred = method.render(cam, options={
                "embedding": embeddings[i] if embeddings is not None else None})
            pred_image = image_to_srgb(pred["color"], np.uint8, color_space=color_space,
                                       allow_alpha=allow_transparency,
                                       background_color=background_color)
            if output_type == "color":
                yield pred_image
            elif output_type == "depth":
                assert "depth" in pred, "Method does not output depth"
                depth_rgb = visualize_depth(
                    pred["depth"],
                    near_far=cameras.nears_fars[i] if cameras.nears_fars is not None else None,
                    expected_scale=expected_scene_scale)
                yield convert_image_dtype(depth_rgb, np.uint8)
            else:
                raise RuntimeError(f"Output type {output_type} is not supported.")

    if str(output).endswith(".tar.gz"):
        with tarfile.open(output, "w:gz") as tar:
            for i, frame in enumerate(_predict_all()):
                rel_path = f"{i:05d}.png"
                tarinfo = tarfile.TarInfo(name=rel_path)
                tarinfo.mtime = int(time.time())
                with io.BytesIO() as f:
                    save_image(f, frame)
                    tarinfo.size = f.tell()
                    f.seek(0)
                    tar.addfile(tarinfo=tarinfo, fileobj=f)
    elif str(output).endswith(".mp4") or str(output).endswith(".gif"):
        try:
            import mediapy
        except ImportError as e:
            raise RuntimeError("mediapy is required for video output") from e
        w, h = cameras.image_sizes[0]
        codec = "gif" if str(output).endswith(".gif") else "h264"
        with mediapy.VideoWriter(output, (h, w), fps=fps, codec=codec) as writer:
            for frame in _predict_all(allow_transparency=False):
                writer.add_image(frame)
    else:
        os.makedirs(output, exist_ok=True)
        for i, frame in enumerate(_predict_all()):
            with open(os.path.join(output, f"{i:05d}.png"), "wb") as f:
                save_image(f, frame)


def trajectory_get_cameras(trajectory: Trajectory) -> Cameras:
    """reference evaluation.py:578-591."""
    if trajectory["camera_model"] != "pinhole":
        raise NotImplementedError("Only pinhole camera model is supported")
    poses = np.stack([x["pose"] for x in trajectory["frames"]])
    intrinsics = np.stack([x["intrinsics"] for x in trajectory["frames"]])
    camera_models = np.array([camera_model_to_int(trajectory["camera_model"])] * len(poses), np.int32)
    image_sizes = np.array([list(trajectory["image_size"])] * len(poses), np.int32)
    return new_cameras(poses=poses, intrinsics=intrinsics, camera_models=camera_models,
                       image_sizes=image_sizes,
                       distortion_parameters=np.zeros((len(poses), 0), np.float32),
                       nears_fars=None, metadata=None)


def trajectory_get_embeddings(method: Method, trajectory: Trajectory) -> Optional[List[np.ndarray]]:
    """reference evaluation.py:594-619."""
    appearances = list(trajectory.get("appearances") or [])
    appearance_embeddings: List[Optional[np.ndarray]] = [None] * len(appearances)
    for i, appearance in enumerate(appearances):
        if appearance.get("embedding") is not None:
            appearance_embeddings[i] = appearance.get("embedding")
        elif appearance.get("embedding_train_index") is not None:
            appearance_embeddings[i] = method.get_train_embedding(
                assert_not_none(appearance.get("embedding_train_index")))
    if all(x is None for x in appearance_embeddings):
        return None
    if not all(x is not None for x in appearance_embeddings):
        raise ValueError("Either all embeddings must be provided or all must be missing")
    if all(x.get("appearance_weights") is None for x in trajectory["frames"]):
        return None
    if not all(x.get("appearance_weights") is not None for x in trajectory["frames"]):
        raise ValueError("Either all appearance weights must be provided or all must be missing")
    appearance_embeddings_np = np.stack(cast(List[np.ndarray], appearance_embeddings))
    out = []
    for frame in trajectory["frames"]:
        out.append(frame.get("appearance_weights") @ appearance_embeddings_np)
    return out


def _encode_values(values: List[float]) -> str:
    return base64.b64encode(b"".join(struct.pack("f", v) for v in values)).decode("ascii")


def serialize_evaluation_results(metrics: Dict, metrics_lists,
                                 evaluation_protocol: str, nb_info: Dict):
    """reference evaluation.py:626-646."""
    precision = 5
    nb_info = serialize_nb_info(nb_info)
    out = {}
    render_datetime = nb_info.pop("render_datetime", None)
    if render_datetime is not None:
        out["render_datetime"] = render_datetime
    render_dataset_metadata = nb_info.pop("render_dataset_metadata", None)
    if render_dataset_metadata is not None:
        out["render_dataset_metadata"] = render_dataset_metadata
    out.update({
        "nb_info": nb_info,
        "evaluate_datetime": datetime.utcnow().isoformat(timespec="seconds"),
        "metrics": {k: round(v, precision) for k, v in metrics.items()},
        "metrics_raw": {k: _encode_values(metrics_lists[k]) for k in metrics_lists},
        "evaluation_protocol": evaluation_protocol,
    })
    return out


def save_evaluation_results(file, metrics: Dict, metrics_lists,
                            evaluation_protocol: str, nb_info: Dict):
    if isinstance(file, str):
        if os.path.exists(file):
            raise FileExistsError(f"{file} already exists")
        with open(file, "w", encoding="utf8") as f:
            return save_evaluation_results(f, metrics, metrics_lists,
                                           evaluation_protocol, nb_info)
    out = serialize_evaluation_results(metrics, metrics_lists, evaluation_protocol, nb_info)
    json.dump(out, file, indent=2)
    return out


def save_cameras_npz(file, cameras):
    numpy_arrays = {}

    def extract_array(arr, name):
        numpy_arrays[name] = arr
        return arr
    cameras.apply(extract_array)
    np.savez(file, **numpy_arrays)


def save_predictions(output: str, predictions: Iterable[RenderOutput],
                     dataset: Dataset, *, nb_info=None) -> Iterable[RenderOutput]:
    """Write gt-color/color/cameras(+depth) to a dir or .tar.gz
    (reference evaluation.py:676-761)."""
    background_color = dataset["metadata"].get("background_color", None)
    assert background_color is None or background_color.dtype == np.uint8
    color_space = dataset["metadata"]["color_space"]
    expected_scene_scale = dataset["metadata"].get("expected_scene_scale")
    allow_transparency = True

    def _predict_all(open_fn) -> Iterable[RenderOutput]:
        for i, (pred, (w, h)) in enumerate(
                zip(predictions, assert_not_none(dataset["cameras"].image_sizes))):
            gt_image = image_to_srgb(dataset["images"][i][:h, :w], np.uint8,
                                     color_space=color_space,
                                     allow_alpha=allow_transparency,
                                     background_color=background_color)
            pred_image = image_to_srgb(pred["color"], np.uint8, color_space=color_space,
                                       allow_alpha=allow_transparency,
                                       background_color=background_color)
            assert gt_image.shape[:-1] == pred_image.shape[:-1], \
                f"gt size {gt_image.shape[:-1]} != pred size {pred_image.shape[:-1]}"
            relative_name = Path(dataset["image_paths"][i])
            if dataset["image_paths_root"] is not None:
                relative_name = relative_name.relative_to(Path(dataset["image_paths_root"]))
            with open_fn(f"gt-color/{relative_name.with_suffix('.png')}") as f:
                save_image(f, gt_image)
            with open_fn(f"color/{relative_name.with_suffix('.png')}") as f:
                save_image(f, pred_image)
            with open_fn(f"cameras/{relative_name.with_suffix('.npz')}") as f:
                save_cameras_npz(f, dataset["cameras"][i])
            if "depth" in pred:
                with open_fn(f"depth/{relative_name.with_suffix('.bin')}") as f:
                    save_depth(f, pred["depth"])
                depth_rgb = visualize_depth(
                    pred["depth"],
                    near_far=dataset["cameras"].nears_fars[i]
                    if dataset["cameras"].nears_fars is not None else None,
                    expected_scale=expected_scene_scale)
                with open_fn(f"depth-rgb/{relative_name.with_suffix('.png')}") as f:
                    save_image(f, depth_rgb)
            if color_space == "linear":
                with open_fn(f"gt-color-linear/{relative_name.with_suffix('.bin')}") as f:
                    save_image(f, dataset["images"][i][:h, :w])
                with open_fn(f"color-linear/{relative_name.with_suffix('.bin')}") as f:
                    save_image(f, pred["color"])
            yield pred

    def write_metadata(open_fn):
        with open_fn("info.json") as fp:
            fp.write(json.dumps(
                serialize_nb_info({
                    **(nb_info or {}),
                    "render_datetime": datetime.utcnow().isoformat(timespec="seconds"),
                    "render_dataset_metadata": dataset["metadata"],
                }), indent=2).encode("utf-8"))

    if str(output).endswith(".tar.gz"):
        with tarfile.open(output, "w:gz") as tar:
            @contextlib.contextmanager
            def open_fn_tar(path):
                tarinfo = tarfile.TarInfo(name=path)
                tarinfo.mtime = int(time.time())
                with io.BytesIO() as f:
                    yield f
                    tarinfo.size = f.tell()
                    f.seek(0)
                    tar.addfile(tarinfo=tarinfo, fileobj=f)
            write_metadata(open_fn_tar)
            yield from _predict_all(open_fn_tar)
    else:
        def open_fn_fs(path):
            path = os.path.join(output, path)
            Path(path).parent.mkdir(parents=True, exist_ok=True)
            return open(path, "wb")
        write_metadata(open_fn_fs)
        yield from _predict_all(open_fn_fs)
