from . import sh, gaussians, rasterize_reference  # noqa: F401
