"""Fused CTR-GC Pallas TPU kernel (placeholder dispatch — kernel lands next).

Until the Mosaic kernel is wired in, this forwards to the XLA fused path so
the dispatch point in tamgcn_tpu.ops.aggregation stays stable.
"""
from __future__ import annotations


def ctr_gc_fused_pallas(x1, x2, x3, w4, b4, alpha, A):
    from ..aggregation import ctr_gc_fused_xla

    return ctr_gc_fused_xla(x1, x2, x3, w4, b4, alpha, A)
