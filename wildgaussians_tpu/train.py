"""Training CLI (mirrors reference train.py:209-376).

`python -m wildgaussians_tpu.train --data <scene> --output out
    [--dataset-type {default,nerfonthego,phototourism}] [--set k=v ...]`
"""
import json
import logging
import math
import os
import shutil
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple, cast

import click
import numpy as np
from tqdm import tqdm

from . import datasets
from .datasets import load_dataset
from .datasets.colmap import load_colmap_dataset
from .datasets.phototourism import (NerfWEvaluationProtocol,
                                    horizontal_half_dataset,
                                    load_phototourism_dataset)
from .evaluation import (DefaultEvaluationProtocol, compute_metrics, evaluate,
                         render_all_images)
from .logging import JsonlLogger, TensorboardLogger, ConcatLogger
from .models.wildgaussians import WildGaussians
from .types import Dataset, EvaluationProtocol, Logger
from .utils import (Indices, MetricsAccumulator, image_to_srgb,
                    make_image_grid, setup_logging, visualize_depth)

logger_py = logging.getLogger(__name__)


class IndicesClickType(click.ParamType):
    """reference utils.py:294-321."""
    name = "indices"

    def convert(self, value, param, ctx):
        if value is None or isinstance(value, Indices):
            return value
        if ":" in value:
            parts = [int(x) if x else None for x in value.split(":")]
            assert len(parts) <= 3
            return Indices(slice(*parts))
        return Indices([int(x) for x in value.split(",")])


class SetParamOptionType(click.ParamType):
    name = "key=value"

    def convert(self, value, param, ctx):
        if isinstance(value, tuple):
            return value
        if "=" not in value:
            self.fail(f"expected key=value, got {value}", param, ctx)
        k, v = value.split("=", 1)
        return k, v


def _outputs_for_split(output: str, step: int, split: str):
    """(predictions archive, results json) paths; stale ones are removed."""
    suffix = "" if split == "test" else f"-{split}"
    preds = os.path.join(output, f"predictions-{step}{suffix}.tar.gz")
    results = os.path.join(output, f"results-{step}{suffix}.json")
    for path in (preds, results):
        if os.path.exists(path):
            (os.unlink if os.path.isfile(path) else shutil.rmtree)(path)
            logger_py.warning("removed existing %s", path)
    return preds, results


def eval_all(method, logger: Logger, dataset: Dataset, *, output: str, step: int,
             evaluation_protocol: EvaluationProtocol, split: str, nb_info):
    """Render + archive every camera of `dataset`, score the archive, and log
    the summary (capability mirror of the reference's final evaluation,
    train.py:33-117)."""
    preds_path, results_path = _outputs_for_split(output, step, split)
    meta = dataset["metadata"]
    sizes = dataset["cameras"].image_sizes

    grid_pairs = []          # first 16 (gt, prediction) sRGB pairs
    total_rays = 0
    start = time.perf_counter()
    renders = render_all_images(
        method, dataset, output=preds_path,
        description=f"rendering all images at step={step}",
        nb_info=nb_info, evaluation_protocol=evaluation_protocol)
    for i, pred in enumerate(renders):
        w, h = sizes[i]
        total_rays += int(w) * int(h)
        if len(grid_pairs) < 16:
            to_srgb = lambda img: image_to_srgb(  # noqa: E731
                img, np.uint8, color_space=meta.get("color_space", "srgb"),
                background_color=meta.get("background_color"))
            grid_pairs.append((to_srgb(dataset["images"][i][:h, :w]),
                               to_srgb(pred["color"])))
    elapsed = time.perf_counter() - start

    info = evaluate(preds_path, results_path,
                    evaluation_protocol=evaluation_protocol,
                    description=f"evaluating all images at step={step}")
    if not logger:
        return
    metrics = dict(info["metrics"])
    metrics["fps"] = len(dataset["cameras"]) / elapsed
    metrics["rays-per-second"] = total_rays / elapsed
    metrics["time"] = elapsed
    with logger.add_event(step) as event:
        for k, v in metrics.items():
            if v == v:  # NaN-valued metrics (e.g. offline lpips) are skipped
                event.add_scalar(f"eval-all-{split}/{k}", v)
    ncol = max(int(math.sqrt(len(grid_pairs))), 1)
    side_by_side = make_image_grid(
        make_image_grid(*[gt for gt, _ in grid_pairs], ncol=ncol),
        make_image_grid(*[render for _, render in grid_pairs], ncol=ncol))
    logger.add_image(f"eval-all-{split}/color", side_by_side, step=step,
                     display_name="color",
                     description="left: gt, right: prediction")


def _slice_dataset(dataset: Dataset):
    for i in range(len(dataset["cameras"])):
        yield datasets.dataset_index_select(dataset, [i])


def eval_few_custom(method: WildGaussians, logger: Logger, dataset: Dataset,
                    split: str, step: int,
                    evaluation_protocol: EvaluationProtocol):
    """Quick periodic eval on a handful of cameras.

    Under the NerfW protocol each camera's appearance embedding is first
    optimized on the LEFT image half and scoring happens on the RIGHT half,
    with an extra non-optimized render column for comparison (reference
    train.py:126-196, phototourism.py:215-251).
    """
    nerfw = evaluation_protocol.get_name() == "nerfw"
    metrics = MetricsAccumulator()
    optim_curves = None
    embeddings = None
    rows = [[] for _ in dataset["cameras"]]     # image-grid row per camera

    if nerfw:
        left = horizontal_half_dataset(dataset, left=True)
        embeddings = []
        for dataslice in _slice_dataset(left):
            optim = method.optimize_embedding(dataslice)
            embeddings.append(optim["embedding"])
            if optim_curves is None and "metrics" in optim:
                optim_curves = optim["metrics"]
        dataset = horizontal_half_dataset(dataset, left=False)

    gt_f = [image_to_srgb(img, dtype=np.float32) for img in dataset["images"]]
    for i, cam in enumerate(dataset["cameras"]):
        rows[i].append(dataset["images"][i])
        if nerfw:
            plain = method.render(cam)["color"]
            metrics.update({f"{k}-nopt": v for k, v in compute_metrics(
                image_to_srgb(plain, dtype=np.float32), gt_f[i]).items()})
            rows[i].append(image_to_srgb(plain, dtype=np.uint8))

    renders = []
    for i, cam in enumerate(dataset["cameras"]):
        opts = {"embedding": embeddings[i]} if embeddings is not None else {"embedding": None}
        color = method.render(cam, options=opts)["color"]
        metrics.update(compute_metrics(image_to_srgb(color, dtype=np.float32),
                                       gt_f[i]))
        renders.append(image_to_srgb(color, dtype=np.uint8))
        rows[i].append(renders[-1])
    cast(Dict, dataset)["renders"] = renders

    with logger.add_event(step) as event:
        for k, v in metrics.pop().items():
            if v == v:
                event.add_scalar(f"eval-few-{split}/{k}", v)
        event.add_image(
            f"eval-few-{split}/color",
            make_image_grid(*[img for row in rows for img in row],
                            ncol=len(rows[0])),
            description="left: gt, then renders")
        if optim_curves is not None:
            for k in ("psnr", "mse"):
                curve = optim_curves[k]
                event.add_plot(f"eval-few-{split}/optimization-{k}",
                               np.stack((np.arange(len(curve)), curve), -1),
                               axes_labels=("iteration", k),
                               title=f"Optimization of {k} over iterations")


_CONFIG_OVERRIDES = {
    "nerfonthego": {"config": "nerfonthego.yml"},
    "phototourism": {"config": "phototourism.yml"},
    "default": {},
}


@click.command("train")
@click.option("--data", type=str, required=True)
@click.option("--output", type=str, default=".")
@click.option("--verbose", "-v", is_flag=True)
@click.option("--debug", is_flag=True)
@click.option("--dataset-type", type=click.Choice(["default", "nerfonthego", "phototourism"]),
              default="default")
@click.option("--eval-few-iters", type=IndicesClickType(), default=Indices.every_iters(2_000),
              help="When to evaluate on few images")
@click.option("--logger", "logger_backend", type=click.Choice(["jsonl", "tensorboard", "both"]),
              default="both")
@click.option("--set", "config_overrides", help="Override a parameter in the method.",
              type=SetParamOptionType(), multiple=True, default=None)
@click.option("--profile", "profile_dir", type=str, default=None,
              help="Capture a jax.profiler trace of steps 20-40 to this dir.")
@click.option("--resume", is_flag=True,
              help="Resume from the latest checkpoint-* in --output.")
def train_command(data, output, verbose, eval_few_iters, dataset_type="default",
                  config_overrides=None, debug=False, logger_backend="both",
                  profile_dir=None, resume=False):
    if debug:
        # NOTE: jax_debug_nans (the set_detect_anomaly analogue,
        # reference train.py:226-232) is intentionally NOT enabled: the
        # fixed-capacity store produces benign masked NaNs for dead slots.
        config_overrides = (config_overrides or ()) + (("iterations", "100"),)
        eval_few_iters = Indices.every_iters(70)
    setup_logging(verbose or debug)

    if config_overrides is not None and isinstance(config_overrides, (list, tuple)):
        config_overrides = dict(config_overrides)
    config_overrides = {**_CONFIG_OVERRIDES[dataset_type], **(config_overrides or {})}

    features = frozenset({"color", "points3D_xyz", "points3D_rgb"})
    if dataset_type == "phototourism":
        evaluation_protocol: EvaluationProtocol = NerfWEvaluationProtocol()
        def load_dataset_fn(path, split):
            return load_phototourism_dataset(path, split=split, features=features)
    else:
        evaluation_protocol = DefaultEvaluationProtocol()
        def load_dataset_fn(path, split):
            return load_colmap_dataset(path, split=split, features=features)

    test_dataset = load_dataset_fn(data, "test")
    train_dataset = load_dataset_fn(data, "train")
    if dataset_type == "nerfonthego":
        dataset_not_official = "Please use the dataset provided for the WG paper"
        assert os.path.exists(os.path.join(data, "nb-info.json")), dataset_not_official
        with open(os.path.join(data, "nb-info.json"), "r", encoding="utf8") as f:
            info = json.load(f)
        assert info.pop("loader", None) == "colmap", dataset_not_official
        info.pop("loader_kwargs", None)
        info_name = info.get("id", info.get("name"))
        assert info_name == "nerfonthego-undistorted", dataset_not_official
        info["id"] = info_name
        test_dataset["metadata"].update(info)
        train_dataset["metadata"].update(info)
    if debug:
        train_dataset = datasets.dataset_index_select(train_dataset, slice(None, 8))
        test_dataset = datasets.dataset_index_select(test_dataset, slice(None, 8))

    train_dataset = datasets.dataset_load_features(train_dataset)
    train_dataset["images"] = [x[..., :3] for x in train_dataset["images"]]
    test_dataset = datasets.dataset_load_features(test_dataset)
    test_dataset["images"] = [x[..., :3] for x in test_dataset["images"]]
    train_images_thumbnails = [img[::8, ::8].copy() for img in train_dataset["images"]]

    output_path = Path(output)
    n_few = min(4, len(train_dataset["cameras"]), len(test_dataset["cameras"]))
    train_dataset_eval_few = datasets.dataset_index_select(train_dataset, list(range(n_few)))
    test_dataset_eval_few = datasets.dataset_index_select(test_dataset, list(range(n_few)))

    checkpoint = None
    if resume:
        found = sorted(Path(output).glob("checkpoint-*"),
                       key=lambda p: int(p.name.split("-")[1]))
        if found:
            checkpoint = str(found[-1])
            logger_py.info("Resuming from %s", checkpoint)
        else:
            logger_py.warning("--resume given but no checkpoint-* in %s",
                              output)
    method = WildGaussians(checkpoint=checkpoint, train_dataset=train_dataset,
                           config_overrides=None if checkpoint else config_overrides)
    info = method.get_info()

    loggers = []
    if logger_backend in ("jsonl", "both"):
        loggers.append(JsonlLogger(str(output_path / "logs")))
    if logger_backend in ("tensorboard", "both"):
        loggers.append(TensorboardLogger(str(output_path / "tensorboard")))
    logger: Logger = ConcatLogger(loggers)
    import dataclasses
    for lg in loggers:
        lg.add_hparams(dataclasses.asdict(method.config))

    def save_checkpoint(at_step: int):
        path = output_path / f"checkpoint-{at_step}"
        if path.exists():
            shutil.rmtree(path)
            logger_py.warning("removed existing checkpoint at %s", path)
        method.save(str(path))
        with open(path / "nb-info.json", "w", encoding="utf8") as f:
            json.dump({"method": "wild-gaussians-tpu"}, f)
        logger_py.info("checkpoint saved at step=%d", at_step)

    def dump_appearance_embeddings(at_step: int):
        labels = [{"name": os.path.relpath(x, train_dataset["image_paths_root"]),
                   "id": i} for i, x in enumerate(train_dataset["image_paths"])]
        logger.add_embedding("train/appearance-embeddings",
                             np.asarray(method.params["appearance_embeddings"]),
                             images=train_images_thumbnails, labels=labels,
                             step=at_step)

    acc_metrics = MetricsAccumulator()
    num_iterations = info["num_iterations"]
    step = start_step = info.get("loaded_step") or 0
    pbar = tqdm(range(start_step, num_iterations), miniters=10,
                desc="training", disable=debug)
    pre_state = None
    for step in pbar:
        if debug:
            # rolling PRE-step snapshot: the analogue of the reference
            # rasterizer's debug mode, which pickles the forward/backward
            # input tensors so a crash can be replayed offline
            # (diff_gaussian_rasterization/__init__.py:85-92,150-157).
            # Here the whole step is one jitted program, so the replayable
            # unit is the full pre-step trainer state.
            pre_state = {k: np.asarray(v)
                         for k, v in method._state_dict().items()}
        if profile_dir is not None and step == 20:
            import jax
            jax.profiler.start_trace(profile_dir)
        metrics = method.train_iteration(step)
        if debug and not np.isfinite(metrics.get("loss", float("nan"))):
            snap = output_path / f"debug-snapshot-{step}.npz"
            np.savez(str(snap), **pre_state)
            with open(output_path / f"debug-snapshot-{step}.json", "w",
                      encoding="utf8") as f:
                json.dump({"step": step,
                           "camera_id": getattr(method, "_last_camera_id",
                                                None),
                           "metrics": {k: float(v)
                                       for k, v in metrics.items()}}, f)
            raise RuntimeError(
                f"non-finite loss at step {step}; pre-step state dumped to "
                f"{snap} (reload with WildGaussians 'checkpoint' npz format)")
        if profile_dir is not None and step == 40:
            import jax
            jax.profiler.stop_trace()
        step += 1
        acc_metrics.update(metrics)

        if step % 100 == 0:
            window = acc_metrics.pop()
            with logger.add_event(step) as event:
                for k, val in window.items():
                    event.add_scalar(f"train/{k}", val)
            pbar.set_postfix({"train/loss": f"{window['loss']:.4f}",
                              "psnr": f"{window['psnr']:.4f}"})
        if step % 10_000 == 0:
            save_checkpoint(step)
            if method.config.appearance_enabled:
                dump_appearance_embeddings(step)
        if step in eval_few_iters:
            for split, few in (("train", train_dataset_eval_few),
                               ("test", test_dataset_eval_few)):
                eval_few_custom(method, logger, few, split=split, step=step,
                                evaluation_protocol=evaluation_protocol)

    eval_all(method, logger, test_dataset, split="test", step=step,
             output=str(output_path), evaluation_protocol=evaluation_protocol,
             nb_info={})
    # the NerfW protocol optimizes embeddings per camera; scoring the whole
    # train split that way is too slow, so only its eval-few subset is used
    train_eval = (train_dataset_eval_few, "trainsubset") \
        if evaluation_protocol.get_name() == "nerfw" else (train_dataset, "train")
    eval_all(method, logger, train_eval[0], split=train_eval[1], step=step,
             output=str(output_path), evaluation_protocol=evaluation_protocol,
             nb_info={})
    if step % 10_000 != 0:
        save_checkpoint(step)


if __name__ == "__main__":
    train_command()  # pylint: disable=no-value-for-parameter
