"""WildGaussians-TPU: a TPU-native (JAX/XLA/Pallas) 3D Gaussian Splatting
framework with the capabilities of jkulhanek/wild-gaussians.

Built from scratch for TPU: the differentiable tile rasterizer is expressed as
prefix-scan + matmul dataflow (pure-XLA and Pallas backends), training runs as
a single jitted step over a fixed-capacity Gaussian store, and scaling uses
jax.sharding meshes with tiles/pixels sharded across devices.
"""

__version__ = "0.1.0"
