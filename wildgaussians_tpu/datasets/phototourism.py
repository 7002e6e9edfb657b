"""Photo Tourism dataset + NeRF-W evaluation protocol
(reference datasets/phototourism.py)."""
import csv
import logging
from pathlib import Path
from typing import Dict, Iterable, Union, cast

import numpy as np

from ..types import Dataset, EvaluationProtocol, Method, RenderOutput
from ..utils import image_to_srgb
from .colmap import load_colmap_dataset
from .common import (DatasetNotFoundError, dataset_index_select,
                     get_default_viewer_transform, get_scene_scale, single)

logger = logging.getLogger(__name__)

DATASET_NAME = "phototourism"

# Scene registry (reference phototourism.py:88-111); download URLs kept for
# API parity — this environment is offline, use pre-downloaded scenes.
_phototourism_downloads = {
    "brandenburg-gate": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/brandenburg_gate.tar.gz",
    "buckingham-palace": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/buckingham_palace.tar.gz",
    "colosseum-exterior": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/colosseum_exterior.tar.gz",
    "grand-palace-brussels": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/grand_place_brussels.tar.gz",
    "notre-dame-facade": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/notre_dame_front_facade.tar.gz",
    "westminster-palace": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/palace_of_westminster.tar.gz",
    "pantheon-exterior": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/pantheon_exterior.tar.gz",
    "taj-mahal": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/taj_mahal.tar.gz",
    "temple-nara": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/temple_nara_japan.tar.gz",
    "trevi-fountain": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/trevi_fountain.tar.gz",
    "sacre-coeur": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/sacre_coeur.tar.gz",
    "hagia-sophia": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/hagia_sophia.tar.gz",
}

_split_lists = {
    "brandenburg-gate": "https://nerf-w.github.io/data/selected_images/brandenburg.tsv",
    "trevi-fountain": "https://nerf-w.github.io/data/selected_images/trevi.tsv",
    "sacre-coeur": "https://nerf-w.github.io/data/selected_images/sacre.tsv",
    "hagia-sophia": "https://nerf-w.github.io/data/selected_images/hagia.tsv",
    "taj-mahal": "https://nerf-w.github.io/data/selected_images/taj_mahal.tsv",
}


def load_phototourism_dataset(path: Union[Path, str], split: str,
                              use_nerfw_split=None, **kwargs):
    """reference phototourism.py:22-81."""
    path = Path(path)
    use_nerfw_split = use_nerfw_split if use_nerfw_split is not None else True
    if split:
        assert split in {"train", "test"}
    if DATASET_NAME not in str(path) or not any(
            s in str(path) for s in _phototourism_downloads):
        raise DatasetNotFoundError(
            f"{set(_phototourism_downloads.keys())} is missing from the dataset path: {path}")

    scene = single(res for res in _phototourism_downloads if str(res) in path.name)
    split_list = None
    if use_nerfw_split:
        if (path / "nerfw_split.csv").exists():
            with (path / "nerfw_split.csv").open() as f:
                reader = csv.reader(f, delimiter="\t")
                next(reader)
                split_list = [x[0] for x in reader if x[1] and x[2] == split]
                assert len(split_list) > 0, f"{split} list is empty"
        else:
            logger.warning("NeRF-W test list not found for %s/%s. Using a standard split.",
                           DATASET_NAME, scene)

    dataset = load_colmap_dataset(path, images_path="images", colmap_path="sparse",
                                  split=None, **kwargs)
    dataset["metadata"]["id"] = DATASET_NAME
    dataset["metadata"]["scene"] = scene
    dataset["metadata"]["expected_scene_scale"] = get_scene_scale(dataset["cameras"], None)
    dataset["metadata"]["type"] = None
    dataset["metadata"]["evaluation_protocol"] = "nerfw"
    viewer_transform, viewer_pose = get_default_viewer_transform(
        dataset["cameras"].poses, None)
    dataset["metadata"]["viewer_transform"] = viewer_transform
    dataset["metadata"]["viewer_initial_pose"] = viewer_pose

    dataset_len = len(dataset["image_paths"])
    if split_list is not None:
        indices = np.array([i for i, x in enumerate(dataset["image_paths"])
                            if Path(x).name in split_list])
        assert len(indices) > 0, f"No images found in {split} list"
        logger.info("Using %d/%d images from the NeRF-W %s list", len(indices),
                    dataset_len, split)
    else:
        all_indices = np.arange(dataset_len)
        llffhold = 8
        if split == "train":
            indices = all_indices % llffhold != 0
        else:
            indices = all_indices % llffhold == 0
    return dataset_index_select(dataset, indices)


def download_phototourism_dataset(path: str, output: Union[Path, str]):
    """Fetch a Photo Tourism capture and extract its dense/ subtree to
    `output`, plus the NeRF-W split list when one exists (reference
    phototourism.py:116-188). `path` is 'phototourism' (all scenes with
    split lists) or 'phototourism/<scene>'."""
    from ..utils import open_any

    output = Path(output)
    if path != DATASET_NAME and not path.startswith(f"{DATASET_NAME}/"):
        raise DatasetNotFoundError(
            f"Dataset path must be '{DATASET_NAME}' or start with '{DATASET_NAME}/'")
    if path == DATASET_NAME:
        for scene in _split_lists:
            download_phototourism_dataset(f"{DATASET_NAME}/{scene}", output / scene)
        return
    scene = path.split("/", 1)[1]
    if scene not in _phototourism_downloads:
        raise DatasetNotFoundError(
            f"Capture '{scene}' is not a valid {DATASET_NAME} scene")
    if output.exists():
        logger.info("Dataset %s already exists in %s", path, output)
        return

    url = _phototourism_downloads[scene]
    # the UBC tarballs hold <archive-stem>/dense/{images,sparse,stereo};
    # only dense/ is the dataset — extract it with the prefix stripped
    prefix = url.rsplit("/", 1)[-1].split(".")[0] + "/dense/"
    tmp_out = output.with_suffix(".tmp")
    import shutil
    import tarfile
    logger.info("Downloading %s from %s", path, url)
    with open_any(url, "r") as f, tarfile.open(fileobj=f, mode="r:gz") as tf:
        members = []
        for m in tf.getmembers():
            if m.path.startswith(prefix):
                m.path = m.path[len(prefix):]
                members.append(m)
        if not members:
            raise RuntimeError(f"Capture '{scene}' not found in {url}")
        tmp_out.mkdir(parents=True, exist_ok=True)
        tf.extractall(tmp_out, members=members, filter="data")
    shutil.rmtree(output, ignore_errors=True)
    shutil.move(str(tmp_out), str(output))

    if scene in _split_lists:
        with open_any(_split_lists[scene], "r") as f:
            (output / "nerfw_split.csv").write_bytes(f.read())
    logger.info("Downloaded %s to %s", path, output)


def horizontal_half_dataset(dataset: Dataset, left: bool = True) -> Dataset:
    """Split each image into left/right halves by shifting cx
    (reference phototourism.py:191-212)."""
    intrinsics = dataset["cameras"].intrinsics.copy()
    image_sizes = dataset["cameras"].image_sizes.copy()
    image_sizes[:, 0] //= 2
    if left:
        image_sizes[:, 0] = dataset["cameras"].image_sizes[:, 0] - image_sizes[:, 0]
    if not left:
        intrinsics[:, 2] -= image_sizes[:, 0]

    def get_slice(img, w):
        return img[:, :w] if left else img[:, -w:]

    out = dict(dataset)
    out.update(dict(
        cameras=dataset["cameras"].replace(intrinsics=intrinsics, image_sizes=image_sizes),
        images=[get_slice(img, w) for img, w in zip(dataset["images"], image_sizes[:, 0])],
        masks=([get_slice(m, w) for m, w in zip(dataset["masks"], image_sizes[:, 0])]
               if dataset["masks"] is not None else None),
    ))
    return cast(Dataset, out)


class NerfWEvaluationProtocol(EvaluationProtocol):
    """Optimize the appearance embedding on the left half, evaluate on the
    right half (reference phototourism.py:215-251)."""

    def __init__(self):
        from ..evaluation import compute_metrics
        self._compute_metrics = compute_metrics

    def get_name(self):
        return "nerfw"

    def render(self, method: Method, dataset: Dataset) -> RenderOutput:
        optimization_dataset = horizontal_half_dataset(dataset, left=True)
        embedding = None
        try:
            pred = method.optimize_embedding(optimization_dataset)
            embedding = pred["embedding"]
        except NotImplementedError:
            pass
        return method.render(dataset["cameras"].item(), options={"embedding": embedding})

    def evaluate(self, predictions: RenderOutput, dataset: Dataset) -> Dict[str, Union[float, int]]:
        assert len(dataset["images"]) == 1, "Only single image evaluation is supported"
        gt = dataset["images"][0]
        color = predictions["color"]
        background_color = dataset["metadata"].get("background_color", None)
        color_srgb = image_to_srgb(color, np.uint8, color_space="srgb",
                                   background_color=background_color)
        gt_srgb = image_to_srgb(gt, np.uint8, color_space="srgb",
                                background_color=background_color)
        w = gt_srgb.shape[1]
        return self._compute_metrics(color_srgb[:, (w // 2):], gt_srgb[:, (w // 2):])

    def accumulate_metrics(self, metrics: Iterable[Dict[str, Union[float, int]]]):
        acc: Dict[str, Union[float, int]] = {}
        for i, data in enumerate(metrics):
            for k, v in data.items():
                acc[k] = (acc.get(k, 0) * i + v) / (i + 1)
        return acc
