"""Model families: TAM/CTR-GCN, ST-GCN, ResNet RGB branch, cross-modal fusion."""
from .ctrgcn import CTRGCN, create_ctrgcn_nucla  # noqa: F401
from .stgcn import STGCN, create_stgcn_nucla, edge_importance_per_joint  # noqa: F401

_REGISTRY = {
    "ctrgcn": CTRGCN,
    "stgcn": STGCN,
    # reference config compatibility (config/nucla/*.yaml model: keys)
    "models.ctrgcn.Model": CTRGCN,
    "models.stgcn.Model": STGCN,
}


def get_model(name: str, **model_args):
    """Instantiate a registered model by name (replacement for the reference's
    dotted-path import_class, torchlight/torchlight/io.py:51-55)."""
    if isinstance(model_args.get("dtype"), str):
        # YAML configs name the compute dtype as a string ("bfloat16")
        import jax.numpy as jnp

        model_args["dtype"] = jnp.dtype(model_args["dtype"])
    # imported lazily to avoid pulling the RGB path in skeleton-only runs
    if name in ("resnet_only", "models.resnet_only.Model"):
        from .resnet_only import ResNetOnly

        return ResNetOnly(**model_args)
    if name in ("resnet_gcn_attention", "models.resnet_gcn_attention.ResNet_GCN_Attention"):
        from .resnet_gcn_attention import ResNetGCNAttention

        return ResNetGCNAttention(**model_args)
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(set(_REGISTRY))}"
        ) from None
    return cls(**model_args)
