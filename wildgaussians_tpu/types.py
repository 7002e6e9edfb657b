"""Public contracts: camera containers, dataset dicts, method/logger protocols.

TPU-native re-implementation of the WildGaussians contracts layer
(reference: wildgaussians/types.py:79-549). Containers are numpy-based on the
host; device code receives plain JAX arrays extracted from these.
"""
import os
import typing
import dataclasses
from abc import abstractmethod
from dataclasses import dataclass
from typing import (
    Any, Callable, Dict, FrozenSet, Generic, Iterable, Iterator, List,
    Literal, Optional, Protocol, Sequence, Tuple, TypeVar, Union,
    runtime_checkable, get_args,
)

import numpy as np

try:
    from typing import NotRequired, Required, TypedDict
except ImportError:  # pragma: no cover
    from typing_extensions import NotRequired, Required, TypedDict  # type: ignore

try:
    from typing import Self
except ImportError:  # pragma: no cover
    from typing_extensions import Self  # type: ignore


WG_PREFIX = os.path.expanduser(os.environ.get("WILD_GAUSSIANS_PREFIX", "~/.cache/wild-gaussians-tpu"))
ColorSpace = Literal["srgb", "linear"]
CameraModel = Literal["pinhole", "opencv", "opencv_fisheye", "full_opencv"]
DatasetFeature = Literal["color", "points3D_xyz", "points3D_rgb"]
TTensor = TypeVar("TTensor", bound=np.ndarray)


def camera_model_to_int(camera_model: CameraModel) -> int:
    """Mirror of reference types.py:79-83."""
    camera_models = get_args(CameraModel)
    if camera_model not in camera_models:
        raise ValueError(f"Unknown camera model {camera_model}, known models are {camera_models}")
    return camera_models.index(camera_model)


def camera_model_from_int(i: int) -> CameraModel:
    camera_models = get_args(CameraModel)
    if i >= len(camera_models):
        raise ValueError(f"Unknown camera model with index {i}, known models are {camera_models}")
    return camera_models[i]


@dataclass(frozen=True)
class Cameras:
    """Batch (or single, if unbatched shapes) of cameras.

    Mirrors reference types.py:162-241 (GenericCamerasImpl):
      poses: [N, 3, 4] camera-to-world (OpenCV convention: x right, y down, z forward)
      intrinsics: [N, 4] (fx, fy, cx, cy)
      camera_models: [N] int (see camera_model_to_int)
      distortion_parameters: [N, P]
      image_sizes: [N, 2] (width, height)
      nears_fars: [N, 2] or None
      metadata: [N, ...] or None
    """
    poses: np.ndarray
    intrinsics: np.ndarray
    camera_models: np.ndarray
    distortion_parameters: np.ndarray
    image_sizes: np.ndarray
    nears_fars: Optional[np.ndarray] = None
    metadata: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return 1 if len(self.poses.shape) == 2 else len(self.poses)

    def item(self) -> "Cameras":
        assert len(self) == 1, "Cameras must have exactly one element to be converted to a single camera"
        return self if len(self.poses.shape) == 2 else self[0]

    def __getitem__(self, index) -> "Cameras":
        return type(self)(
            poses=self.poses[index],
            intrinsics=self.intrinsics[index],
            camera_models=self.camera_models[index],
            distortion_parameters=self.distortion_parameters[index],
            image_sizes=self.image_sizes[index],
            nears_fars=self.nears_fars[index] if self.nears_fars is not None else None,
            metadata=self.metadata[index] if self.metadata is not None else None,
        )

    def __iter__(self) -> Iterator["Cameras"]:
        for i in range(len(self)):
            yield self[i]

    @classmethod
    def cat(cls, values: Sequence["Cameras"]) -> "Cameras":
        nears_fars = metadata = None
        if any(v.nears_fars is not None for v in values):
            assert all(v.nears_fars is not None for v in values)
            nears_fars = np.concatenate([v.nears_fars for v in values])  # type: ignore
        if any(v.metadata is not None for v in values):
            assert all(v.metadata is not None for v in values)
            metadata = np.concatenate([v.metadata for v in values])  # type: ignore
        return cls(
            poses=np.concatenate([v.poses for v in values]),
            intrinsics=np.concatenate([v.intrinsics for v in values]),
            camera_models=np.concatenate([v.camera_models for v in values]),
            distortion_parameters=np.concatenate([v.distortion_parameters for v in values]),
            image_sizes=np.concatenate([v.image_sizes for v in values]),
            nears_fars=nears_fars,
            metadata=metadata,
        )

    def replace(self, **changes) -> "Cameras":
        return dataclasses.replace(self, **changes)

    def apply(self, fn: Callable[[np.ndarray, str], np.ndarray]) -> "Cameras":
        return Cameras(
            poses=fn(self.poses, "poses"),
            intrinsics=fn(self.intrinsics, "intrinsics"),
            camera_models=fn(self.camera_models, "camera_models"),
            distortion_parameters=fn(self.distortion_parameters, "distortion_parameters"),
            image_sizes=fn(self.image_sizes, "image_sizes"),
            nears_fars=fn(self.nears_fars, "nears_fars") if self.nears_fars is not None else None,
            metadata=fn(self.metadata, "metadata") if self.metadata is not None else None,
        )


GenericCameras = Cameras  # alias kept for API parity with the reference


def new_cameras(
    *,
    poses: np.ndarray,
    intrinsics: np.ndarray,
    camera_models: np.ndarray,
    distortion_parameters: np.ndarray,
    image_sizes: np.ndarray,
    nears_fars: Optional[np.ndarray] = None,
    metadata: Optional[np.ndarray] = None,
) -> Cameras:
    """Mirror of reference types.py:244-261."""
    return Cameras(
        poses=poses,
        intrinsics=intrinsics,
        camera_models=camera_models,
        distortion_parameters=distortion_parameters,
        image_sizes=image_sizes,
        nears_fars=nears_fars,
        metadata=metadata,
    )


class _IncompleteDataset(TypedDict, total=True):
    cameras: Cameras
    image_paths: List[str]
    image_paths_root: str
    mask_paths: Optional[List[str]]
    mask_paths_root: Optional[str]
    metadata: Dict
    masks: Optional[Union[np.ndarray, List[np.ndarray]]]
    points3D_xyz: Optional[np.ndarray]
    points3D_rgb: Optional[np.ndarray]
    images_points3D_indices: Optional[List[np.ndarray]]


class UnloadedDataset(_IncompleteDataset):
    images: NotRequired[Optional[Union[np.ndarray, List[np.ndarray]]]]


class Dataset(_IncompleteDataset):
    images: Union[np.ndarray, List[np.ndarray]]


class RenderOutput(TypedDict, total=False):
    color: Required[np.ndarray]  # [h w 3]
    depth: np.ndarray  # [h w]
    accumulation: np.ndarray  # [h w]


class OptimizeEmbeddingOutput(TypedDict):
    embedding: np.ndarray
    render_output: RenderOutput
    metrics: NotRequired[Dict[str, Sequence[float]]]


class MethodInfo(TypedDict, total=False):
    method_id: Required[str]
    required_features: FrozenSet[DatasetFeature]
    supported_camera_models: FrozenSet


class ModelInfo(TypedDict, total=False):
    method_id: Required[str]
    num_iterations: Required[int]
    loaded_step: Optional[int]
    loaded_checkpoint: Optional[str]
    batch_size: int
    eval_batch_size: int
    required_features: FrozenSet[DatasetFeature]
    supported_camera_models: FrozenSet
    hparams: Dict[str, Any]


@runtime_checkable
class Method(Protocol):
    """The NerfBaselines-compatible method protocol (reference types.py:316-406)."""

    def __init__(self, *,
                 checkpoint: Union[str, None] = None,
                 train_dataset: Optional[Dataset] = None,
                 config_overrides: Optional[Dict[str, Any]] = None):
        pass

    @classmethod
    def install(cls):
        pass

    @classmethod
    @abstractmethod
    def get_method_info(cls) -> MethodInfo:
        raise NotImplementedError()

    @abstractmethod
    def get_info(self) -> ModelInfo:
        raise NotImplementedError()

    @abstractmethod
    def get_train_embedding(self, index: int) -> Optional[np.ndarray]:
        return None

    @abstractmethod
    def optimize_embedding(self, dataset: Dataset, *, embedding: Optional[np.ndarray] = None) -> OptimizeEmbeddingOutput:
        raise NotImplementedError()

    @abstractmethod
    def render(self, camera: Cameras, *, options: Optional[Dict] = None) -> RenderOutput:
        raise NotImplementedError()

    @abstractmethod
    def train_iteration(self, step: int):
        raise NotImplementedError()

    @abstractmethod
    def save(self, path: str):
        raise NotImplementedError()


@runtime_checkable
class EvaluationProtocol(Protocol):
    def get_name(self) -> str: ...
    def render(self, method: Method, dataset: Dataset) -> RenderOutput: ...
    def evaluate(self, predictions: RenderOutput, dataset: Dataset) -> Dict[str, Union[float, int]]: ...
    def accumulate_metrics(self, metrics: Iterable[Dict[str, Union[float, int]]]) -> Dict[str, Union[float, int]]: ...


class DatasetSpecMetadata(TypedDict, total=False):
    id: str
    name: str
    description: str
    paper_title: str
    paper_authors: List[str]
    paper_link: str
    link: str
    metrics: List[str]
    default_metric: str
    scenes: List[Dict[str, str]]


class LoadDatasetFunction(Protocol):
    def __call__(self, path: str, split: str,
                 features: Optional[FrozenSet[DatasetFeature]] = None,
                 **kwargs) -> UnloadedDataset: ...


class DownloadDatasetFunction(Protocol):
    def __call__(self, path: str, output: str) -> None: ...


class TrajectoryFrameAppearance(TypedDict, total=False):
    embedding: Optional[np.ndarray]
    embedding_train_index: Optional[int]


class TrajectoryFrame(TypedDict, total=True):
    pose: np.ndarray
    intrinsics: np.ndarray
    appearance_weights: NotRequired[np.ndarray]


class TrajectoryKeyframe(TypedDict, total=True):
    pose: np.ndarray
    fov: Optional[float]
    transition_duration: NotRequired[Optional[float]]
    appearance: NotRequired[TrajectoryFrameAppearance]


TrajectoryInterpolationType = Literal["kochanek-bartels", "none"]


class ImageSetInterpolationSource(TypedDict, total=True):
    type: Literal["interpolation"]
    interpolation: Literal["none"]
    keyframes: List[TrajectoryKeyframe]
    default_fov: float
    default_transition_duration: float
    default_appearance: NotRequired[Optional[TrajectoryFrameAppearance]]


class KochanekBartelsInterpolationSource(TypedDict, total=True):
    type: Literal["interpolation"]
    interpolation: Literal["kochanek-bartels"]
    is_cycle: bool
    tension: float
    keyframes: List[TrajectoryKeyframe]
    default_fov: float
    default_transition_duration: float
    default_appearance: NotRequired[Optional[TrajectoryFrameAppearance]]


TrajectoryInterpolationSource = Union[ImageSetInterpolationSource, KochanekBartelsInterpolationSource]


class Trajectory(TypedDict, total=True):
    camera_model: CameraModel
    image_size: Tuple[int, int]
    frames: List[TrajectoryFrame]
    appearances: NotRequired[List[TrajectoryFrameAppearance]]
    fps: float
    source: NotRequired[Optional[TrajectoryInterpolationSource]]


@runtime_checkable
class LoggerEvent(Protocol):
    def add_scalar(self, tag: str, value: Union[float, int]) -> None: ...
    def add_text(self, tag: str, text: str) -> None: ...
    def add_image(self, tag: str, image: np.ndarray, display_name: Optional[str] = None,
                  description: Optional[str] = None, **kwargs) -> None: ...
    def add_embedding(self, tag: str, embeddings: np.ndarray, *,
                      images: Optional[List[np.ndarray]] = None,
                      labels: Union[None, List[Dict[str, str]], List[str]] = None) -> None: ...
    def add_plot(self, tag: str, *data: np.ndarray,
                 axes_labels: Optional[Sequence[str]] = None,
                 title: Optional[str] = None, **kwargs) -> None: ...
    def add_histogram(self, tag: str, values: np.ndarray, *, num_bins: Optional[int] = None) -> None: ...


@runtime_checkable
class Logger(Protocol):
    def add_event(self, step: int) -> typing.ContextManager[LoggerEvent]: ...
    def add_scalar(self, tag: str, value: Union[float, int], step: int) -> None: ...
    def add_text(self, tag: str, text: str, step: int) -> None: ...
    def add_image(self, tag: str, image: np.ndarray, step: int, *,
                  display_name: Optional[str] = None, description: Optional[str] = None) -> None: ...
    def add_embedding(self, tag: str, embeddings: np.ndarray, step: int, *,
                      images: Optional[List[np.ndarray]] = None,
                      labels: Union[None, List[Dict[str, str]], List[str]] = None) -> None: ...
