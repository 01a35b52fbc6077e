"""Edge-partitioned graph parallelism: joint-sharded aggregation over ICI.

The GCN aggregation `out[..., i, c] = sum_j A[i, j] * x[..., j, c]` is, at
pod scale, a distributed SpMM: shard the joint (vertex) axis over a mesh
axis and every chip owns V/k joints' features plus the adjacency rows of its
output joints. Instead of an up-front all_gather (which serialises all
boundary traffic before any compute), `ring_aggregate` pipelines a ring
exchange: at step s each chip multiplies against the joint block it
currently holds while `lax.ppermute` forwards that block to the next chip —
all-to-all boundary-joint feature exchange overlapped with local
aggregation. This is the TPU-native counterpart of halo exchange in
edge-partitioned GNN systems; the reference has no distributed support at
all (SURVEY §2.3, processor/io.py:86-87 is single-process DataParallel).

Built on shard_map so models/tests can drop it in under any mesh; with k=1
it degrades to a plain einsum. The skeleton graphs here are small (V=20/25),
so in production shapes the vertex axis is sharded only for the long-T NTU
configs where the (N, C, T, V) activations dominate HBM — but the algorithm
is V-scale-free and is validated on the 8-device CPU mesh in
tests/test_sharding.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map, replication checking renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f=None, **kw):
        kw["check_vma"] = kw.pop("check_rep", kw.pop("check_vma", True))
        return _shard_map(f, **kw) if f is not None else _shard_map(**kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_body(s, carry, *, axis_name, k):
    """One ring step: aggregate the resident joint block, forward it."""
    acc, block, a_cols = carry
    me = jax.lax.axis_index(axis_name)
    # blocks travel i -> i+1, so the block resident here at step s
    # originated on chip (me - s) mod k; its columns of the
    # (local-rows, V) adjacency slab:
    src = (me - s) % k
    vb = block.shape[-2]
    a_blk = jax.lax.dynamic_slice_in_dim(a_cols, src * vb, vb, axis=1)
    # local partial: (..., V_local_out, C) += a_blk @ block
    acc = acc + jnp.einsum(
        "uv,...vc->...uc", a_blk, block,
        preferred_element_type=jnp.float32,
    )
    # forward the block around the ring (overlaps with the next step's
    # compute under XLA's async collective scheduling)
    block = jax.lax.ppermute(
        block, axis_name, [(i, (i + 1) % k) for i in range(k)]
    )
    return acc, block, a_cols


def ring_aggregate(
    x: jax.Array, A: jax.Array, mesh: Mesh, axis_name: str = "model"
) -> jax.Array:
    """Distributed `out[..., u, c] = sum_v A[u, v] x[..., v, c]` with the
    joint axis of `x` (second-to-last) sharded over `axis_name`.

    x: (..., V, C) float; A: (V, V) dense adjacency (any partition mix).
    Returns out with the same sharding as x. V must divide by the axis size.
    """
    k = mesh.shape[axis_name]
    if k == 1:
        return jnp.einsum("uv,...vc->...uc", A, x)
    V = x.shape[-2]
    if V % k:
        raise ValueError(f"joint axis {V} not divisible by mesh axis {k}")

    n_batch = x.ndim - 2
    xspec = P(*([None] * n_batch), axis_name, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(xspec, P(axis_name, None)),
        out_specs=xspec,
        check_rep=False,
    )
    def run(x_local, a_rows):
        # x_local: (..., V/k, C) — this chip's joints
        # a_rows:  (V/k, V)     — adjacency rows of this chip's OUT joints
        acc = jnp.zeros(x_local.shape[:-2] + a_rows.shape[:1] + x_local.shape[-1:],
                        jnp.float32)
        acc, _, _ = jax.lax.fori_loop(
            0, k,
            partial(_ring_body, axis_name=axis_name, k=k),
            (acc, x_local, a_rows),
        )
        return acc.astype(x_local.dtype)

    return run(x, A)


def _ring_body_stgcn(s, carry, *, axis_name, k):
    """One ring step of the K-partition aggregation (see ring_aggregate_stgcn)."""
    acc, block, at_rows = carry
    me = jax.lax.axis_index(axis_name)
    src = (me - s) % k
    vb = block.shape[-3]
    # at_rows: (K, W_local, V) — slice the source chip's joint columns
    a_blk = jax.lax.dynamic_slice_in_dim(at_rows, src * vb, vb, axis=2)
    # acc[..., u, c] += sum_{p, v} a_blk[p, u, v] * block[..., v, p, c]
    acc = acc + jnp.einsum(
        "puv,...vpc->...uc", a_blk, block,
        preferred_element_type=jnp.float32,
    )
    block = jax.lax.ppermute(
        block, axis_name, [(i, (i + 1) % k) for i in range(k)]
    )
    return acc, block, at_rows


def ring_aggregate_stgcn(
    x: jax.Array,
    A: jax.Array,
    mesh: Mesh,
    axis_name: str = "model",
    data_axis: str | None = "data",
) -> jax.Array:
    """Edge-partitioned ST-GCN aggregation `out[..., w, c] = sum_{k,v}
    x[..., v, k, c] * A[k, v, w]` (ops.stgcn_aggregate) with the joint axis
    sharded over `axis_name`.

    x: (N, T, V, K, C); A: (K, V, W) stacked partition adjacencies. The ring
    pipelines the all-to-all joint-feature exchange (lax.ppermute) against the
    local partial aggregation, exactly like `ring_aggregate`, with the
    partition axis K contracted inside each local einsum. The leading batch
    axis keeps its `data_axis` (DP) sharding, so this composes with the
    data-parallel train step; with axis size 1 it degrades to the plain
    einsum. Counterpart of reference models/stgcn.py:62 at pod scale.
    """
    k = mesh.shape[axis_name]
    if k == 1:
        return jnp.einsum(
            "ntvpc,pvw->ntwc", x, A,
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        ).astype(x.dtype)
    V = x.shape[-3]
    if V % k:
        raise ValueError(f"joint axis {V} not divisible by mesh axis {k}")
    if data_axis is not None and mesh.shape.get(data_axis, 1) == 1:
        data_axis = None

    xspec = P(data_axis, *([None] * (x.ndim - 4)), axis_name, None, None)
    ospec = P(data_axis, *([None] * (x.ndim - 4)), axis_name, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(xspec, P(None, axis_name, None)),
        out_specs=ospec,
        check_rep=False,
    )
    def run(x_local, at_rows):
        # x_local: (..., V/k, K, C) — this chip's joints (+ its DP batch shard)
        # at_rows: (K, W/k, V)     — A^T rows of this chip's OUT joints
        acc = jnp.zeros(
            x_local.shape[:-3] + at_rows.shape[1:2] + x_local.shape[-1:],
            jnp.float32,
        )
        acc, _, _ = jax.lax.fori_loop(
            0, k,
            partial(_ring_body_stgcn, axis_name=axis_name, k=k),
            (acc, x_local, at_rows),
        )
        return acc.astype(x_local.dtype)

    return run(x, jnp.swapaxes(A, -1, -2))


def shard_joints(mesh: Mesh, x: jax.Array, axis_name: str = "model"):
    """Place (..., V, C) with the joint axis sharded over `axis_name`."""
    spec = P(*([None] * (x.ndim - 2)), axis_name, None)
    return jax.device_put(x, NamedSharding(mesh, spec))
