"""Pallas TPU kernels for the hot ops (fused CTR-GC refine+aggregate)."""
