"""Model layer: the WildGaussians method and its submodules."""


def __getattr__(name):
    if name == "WildGaussians":
        from .wildgaussians import WildGaussians
        return WildGaussians
    if name == "UncertaintyModel":
        from .uncertainty import UncertaintyModel
        return UncertaintyModel
    if name == "DinoV2":
        from .dinov2 import DinoV2
        return DinoV2
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
