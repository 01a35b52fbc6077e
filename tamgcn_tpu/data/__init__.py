"""Data pipeline: NW-UCLA feeders, augmentation transforms, batch loader."""
from .feeder_nucla_gcn import NUCLAFeederGCN  # noqa: F401
from .loader import Loader  # noqa: F401
from .splits import load_nucla_split  # noqa: F401


def resolve_feeder(name: str):
    """Feeder class by registry name (replacement for the reference's
    dotted-path import). Exposed so callers can inspect the constructor
    (e.g. the trainer probes for a `seed` parameter by signature instead
    of catching TypeError from the whole __init__)."""
    if name in ("nucla_gcn", "feeder.feeder_nucla_gcn.Feeder"):
        return NUCLAFeederGCN
    if name in ("nucla_resnet", "feeder.feeder_nucla_resnet.Feeder"):
        from .feeder_nucla_resnet import NUCLAFeederResNet

        return NUCLAFeederResNet
    if name in ("nucla_fusion", "feeder.feeder_nucla_fusion.Feeder"):
        from .feeder_nucla_fusion import NUCLAFeederFusion

        return NUCLAFeederFusion
    if name in ("skeleton_gcn",):
        from .feeder_skeleton_gcn import SkeletonFeederGCN

        return SkeletonFeederGCN
    if name in ("synthetic_gcn",):
        from .synthetic import SyntheticSkeletonFeeder

        return SyntheticSkeletonFeeder
    if name in ("synthetic_fusion",):
        from .synthetic import SyntheticFusionFeeder

        return SyntheticFusionFeeder
    if name in ("synthetic_rgb",):
        from .synthetic import SyntheticRGBFeeder

        return SyntheticRGBFeeder
    raise KeyError(f"unknown feeder {name!r}")


def feeder_accepts_seed(name: str) -> bool:
    """True if the named feeder's constructor takes a `seed` parameter."""
    import inspect

    params = inspect.signature(resolve_feeder(name).__init__).parameters
    return "seed" in params


def get_feeder(name: str, **feeder_args):
    """Instantiate a registered feeder by name."""
    return resolve_feeder(name)(**feeder_args)
