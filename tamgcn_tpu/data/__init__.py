"""Data pipeline: NW-UCLA feeders, augmentation transforms, batch loader."""
from .feeder_nucla_gcn import NUCLAFeederGCN  # noqa: F401
from .loader import Loader  # noqa: F401
from .splits import load_nucla_split  # noqa: F401


def get_feeder(name: str, **feeder_args):
    """Feeder registry (replacement for the reference's dotted-path import)."""
    if name in ("nucla_gcn", "feeder.feeder_nucla_gcn.Feeder"):
        return NUCLAFeederGCN(**feeder_args)
    if name in ("nucla_resnet", "feeder.feeder_nucla_resnet.Feeder"):
        from .feeder_nucla_resnet import NUCLAFeederResNet

        return NUCLAFeederResNet(**feeder_args)
    if name in ("nucla_fusion", "feeder.feeder_nucla_fusion.Feeder"):
        from .feeder_nucla_fusion import NUCLAFeederFusion

        return NUCLAFeederFusion(**feeder_args)
    if name in ("skeleton_gcn",):
        from .feeder_skeleton_gcn import SkeletonFeederGCN

        return SkeletonFeederGCN(**feeder_args)
    if name in ("synthetic_gcn",):
        from .synthetic import SyntheticSkeletonFeeder

        return SyntheticSkeletonFeeder(**feeder_args)
    if name in ("synthetic_fusion",):
        from .synthetic import SyntheticFusionFeeder

        return SyntheticFusionFeeder(**feeder_args)
    raise KeyError(f"unknown feeder {name!r}")
