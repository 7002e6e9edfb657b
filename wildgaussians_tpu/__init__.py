"""WildGaussians-TPU: a TPU-native (JAX/XLA/Pallas) 3D Gaussian Splatting
framework with the capabilities of jkulhanek/wild-gaussians.

Built from scratch for TPU: the differentiable tile rasterizer is expressed as
prefix-scan + matmul dataflow (pure-XLA and Pallas backends), training runs as
a single jitted step over a fixed-capacity Gaussian store, and scaling uses
jax.sharding meshes with tiles/pixels sharded across devices.
"""

__version__ = "0.1.0"

from .config import Config, load_config_yaml, merge_config  # noqa: F401
from .types import (Cameras, Dataset, Method, MethodInfo, ModelInfo,  # noqa: F401
                    RenderOutput, new_cameras, camera_model_to_int)


def __getattr__(name):
    # heavy imports on demand (keep `import wildgaussians_tpu` light)
    if name == "WildGaussians":
        from .models.wildgaussians import WildGaussians
        return WildGaussians
    if name == "rasterize_gaussians":
        from .ops.rasterize import rasterize_gaussians
        return rasterize_gaussians
    if name == "load_dataset":
        from .datasets import load_dataset
        return load_dataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
