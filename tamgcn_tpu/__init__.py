"""tamgcn_tpu — a TPU-native spatio-temporal GNN framework for skeleton-based
action recognition.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference PyTorch framework (Tamnemng/TAM-GCN): the TAM/CTR-GCN and ST-GCN
model families, NW-UCLA / NTU RGB+D graph builders, the NW-UCLA data pipeline,
a config-driven training runtime, RGB/fusion branches and score-level
ensembling — all built TPU-first:

  * activations live in NTVC layout (batch, time, vertex, channel) so temporal
    convolutions and the channel dimension map onto TPU (8, 128) vector tiles;
  * the CTR-GC hot path (SDDMM-shaped topology refinement + per-channel
    aggregation, reference models/ctrgcn.py:172-177) runs as a fused Pallas
    kernel that never materialises the (N, C, V, V) dynamic adjacency in HBM;
  * scaling is mesh/sharding-native (jax.sharding + pjit/shard_map), not a
    DataParallel translation.
"""

__version__ = "0.1.0"
