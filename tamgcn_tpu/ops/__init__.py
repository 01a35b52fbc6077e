"""Compute ops: XLA einsum paths and Pallas TPU kernels for the hot math."""
from .aggregation import (  # noqa: F401
    ctr_gc_aggregate,
    ctr_gc_dynamic_adjacency,
    ctr_gc_fused,
    ctr_gc_fused_xla,
    stgcn_aggregate,
)
