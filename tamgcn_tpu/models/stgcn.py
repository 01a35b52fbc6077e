"""ST-GCN with learnable per-layer edge importance.

TPU-native re-design of reference models/stgcn.py (ConvTemporalGraphical
:37-63, st_gcn block :66-99, Model :102-252). Numerics match the reference
per-layer (tests/test_parity_torch.py). Activations are NTVC; the 3-partition
spatial aggregation 'nkctv,kvw->nctw' (reference :62) becomes
tamgcn_tpu.ops.stgcn_aggregate in 'ntvkc,kvw->ntwc' form, which XLA lowers to
a single MXU contraction over (k, v).

Parameter inits follow PyTorch defaults (the reference applies no custom init
to ST-GCN): conv kernels/biases kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.norm import BatchNorm

from ..graphs import get_graph
from ..ops import stgcn_aggregate

BN = {"momentum": 0.9, "epsilon": 1e-5}


def torch_conv_default_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: kaiming_uniform_(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax kernel layout (kh, kw, in, out): fan_in = in * kh * kw.
    """
    *kernel_dims, in_ch, _ = shape
    receptive = 1
    for k in kernel_dims:
        receptive *= k
    bound = 1.0 / math.sqrt(in_ch * receptive)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_default_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(features, kernel_size, fan_in, strides=(1, 1), padding="VALID",
          dtype=None, name=None):
    return nn.Conv(
        features,
        kernel_size,
        strides=strides,
        padding=padding,
        kernel_init=torch_conv_default_kernel_init,
        bias_init=torch_conv_default_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


class ConvTemporalGraphical(nn.Module):
    """Spatial graph conv: out = sum_k conv_k(x) @ A_k (reference :37-63)."""

    in_channels: int
    out_channels: int
    kernel_size: int  # number of adjacency partitions K
    t_kernel_size: int = 1
    t_stride: int = 1
    t_padding: int = 0
    t_dilation: int = 1
    dtype: Any = None
    # aggregation override: (h (N,T,V,K,C), A (K,V,W)) -> (N,T,W,C);
    # None = the dense XLA einsum (ops.stgcn_aggregate). The edge-partitioned
    # ring (parallel/graph_parallel.ring_aggregate_stgcn) plugs in here.
    aggregate: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array) -> jax.Array:
        assert A.shape[0] == self.kernel_size
        n_in = self.in_channels * self.t_kernel_size
        h = nn.Conv(
            self.out_channels * self.kernel_size,
            (self.t_kernel_size, 1),
            strides=(self.t_stride, 1),
            padding=[(self.t_padding, self.t_padding), (0, 0)],
            kernel_dilation=(self.t_dilation, 1),
            kernel_init=torch_conv_default_kernel_init,
            bias_init=torch_conv_default_bias_init(n_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        n, t, v, kc = h.shape
        h = h.reshape(n, t, v, self.kernel_size, kc // self.kernel_size)
        return (self.aggregate or stgcn_aggregate)(h, A)


class STGCNBlock(nn.Module):
    """One ST-GCN block: GCN + TCN + residual (reference st_gcn :66-99)."""

    in_channels: int
    out_channels: int
    kernel_size: tuple  # (temporal, spatial)
    stride: int = 1
    dropout: float = 0.0
    residual: bool = True
    dtype: Any = None
    aggregate: Any = None  # see ConvTemporalGraphical.aggregate

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array, *, train: bool) -> jax.Array:
        assert len(self.kernel_size) == 2
        assert self.kernel_size[0] % 2 == 1
        pad = (self.kernel_size[0] - 1) // 2

        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = _conv(
                self.out_channels,
                (1, 1),
                self.in_channels,
                strides=(self.stride, 1),
                dtype=self.dtype,
                name="res_conv",
            )(x)
            res = BatchNorm(
                use_running_average=not train, dtype=self.dtype, **BN,
                name="res_bn",
            )(res)

        h = ConvTemporalGraphical(
            self.in_channels, self.out_channels, self.kernel_size[1],
            dtype=self.dtype, aggregate=self.aggregate, name="gcn",
        )(x, A)
        # tcn: BN -> ReLU -> (k,1) conv -> BN -> Dropout (reference :76-82)
        h = BatchNorm(
            use_running_average=not train, dtype=self.dtype, **BN,
            name="tcn_bn1",
        )(h)
        h = nn.relu(h)
        h = _conv(
            self.out_channels,
            (self.kernel_size[0], 1),
            self.out_channels * self.kernel_size[0],
            strides=(self.stride, 1),
            padding=[(pad, pad), (0, 0)],
            dtype=self.dtype,
            name="tcn_conv",
        )(h)
        h = BatchNorm(
            use_running_average=not train, dtype=self.dtype, **BN,
            name="tcn_bn2",
        )(h)
        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.relu(h + res)


class STGCN(nn.Module):
    """ST-GCN model (reference models/stgcn.py:102-252).

    10 blocks 64 -> 128 (stride 2) -> 256 (stride 2); per-layer learnable
    edge-importance masks on the 3-partition adjacency; conv head.
    Note the reference's data_bn is only consistent for num_person == 1
    (declared M*V*C features, fed V*C, reference :138 vs :181) — we implement
    the working M == 1 semantics.
    """

    in_channels: int = 3
    num_class: int = 4
    num_point: int = 20
    num_person: int = 1
    graph: Any = None
    graph_args: Any = None
    edge_importance_weighting: bool = True
    dropout: float = 0.0
    block_dropout: float = 0.0  # reference **kwargs dropout forwarded to st_gcn
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32
    # edge-partitioned graph parallelism: "ring" shards the joint axis over
    # the mesh's 'model' axis and pipelines the boundary-feature exchange
    # against local aggregation (parallel/graph_parallel.ring_aggregate_stgcn,
    # the scaling mechanism named in BASELINE.json). Requires `mesh` with
    # model-axis size dividing num_point; "none" = dense XLA einsum.
    graph_partition: str = "none"
    mesh: Any = None

    def setup(self):
        if self.graph is None:
            raise ValueError("graph must be specified")
        if isinstance(self.graph, np.ndarray):
            A = self.graph
        elif isinstance(self.graph, str):
            A = get_graph(self.graph, **(self.graph_args or {})).A
        else:
            A = self.graph.A
        self.A = jnp.asarray(A, jnp.float32)

        spatial_k = A.shape[0]
        ks = (9, spatial_k)
        cfg = [
            (self.in_channels, 64, 1, False),
            (64, 64, 1, True),
            (64, 64, 1, True),
            (64, 64, 1, True),
            (64, 128, 2, True),
            (128, 128, 1, True),
            (128, 128, 1, True),
            (128, 256, 2, True),
            (256, 256, 1, True),
            (256, 256, 1, True),
        ]
        if self.graph_partition == "ring":
            if self.mesh is None:
                raise ValueError("graph_partition='ring' requires a mesh")
            from functools import partial

            from ..parallel.graph_parallel import ring_aggregate_stgcn

            k = self.mesh.shape["model"]
            if self.num_point % k:
                raise ValueError(
                    f"num_point={self.num_point} not divisible by the "
                    f"model mesh axis ({k}) for graph_partition='ring'"
                )
            aggregate = partial(ring_aggregate_stgcn, mesh=self.mesh)
        elif self.graph_partition in ("none", None):
            aggregate = None
        else:
            raise ValueError(f"unknown graph_partition {self.graph_partition!r}")

        self.blocks = [
            STGCNBlock(i, o, ks, s, dropout=self.block_dropout, residual=r,
                       dtype=self.dtype, aggregate=aggregate)
            for (i, o, s, r) in cfg
        ]
        if self.edge_importance_weighting:
            self.edge_importance = [
                self.param(f"edge_importance_{i}", nn.initializers.ones, self.A.shape)
                for i in range(len(cfg))
            ]
        else:
            self.edge_importance = [1.0] * len(cfg)

        self.data_bn = BatchNorm(dtype=self.dtype, **BN)
        # head: 1x1 conv == Dense on pooled features (reference :163)
        self.fcn = nn.Dense(
            self.num_class,
            kernel_init=lambda k, s, d=jnp.float32: torch_conv_default_kernel_init(
                k, (1, 1) + s, d
            )[0, 0],
            bias_init=torch_conv_default_bias_init(256),
            dtype=self.dtype,
        )
        self.drop = nn.Dropout(self.dropout) if self.dropout else None

    def _to_ncvtm(self, x: jax.Array) -> jax.Array:
        if x.ndim == 3:
            N, T, VC = x.shape
            x = x.reshape(N, T, self.num_point, VC // self.num_point)
            x = jnp.transpose(x, (0, 3, 1, 2))[..., None]
        return x

    def _stem(self, x: jax.Array, train: bool):
        """data BN over (V, C) features per (N*M) sample (reference :179-184)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        N, C, T, V, M = x.shape
        h = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(N * M, T, V * C)
        h = self.data_bn(h, use_running_average=not train)
        h = h.reshape(N * M, T, V, C)
        return h, N, M

    def _backbone(self, h: jax.Array, train: bool) -> jax.Array:
        for blk, importance in zip(self.blocks, self.edge_importance):
            h = blk(h, self.A * importance, train=train)
        return h

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = self._to_ncvtm(x)
        h, N, M = self._stem(x, train)
        h = self._backbone(h, train)  # (N*M, T', V, 256)
        h = h.mean(axis=(1, 2))  # global avg pool over (T', V)
        h = h.reshape(N, M, -1).mean(axis=1)
        if self.drop is not None:
            h = self.drop(h, deterministic=not train)
        # logits in f32: the loss/softmax should not run in bf16
        # promote (not cast): bf16 -> f32 for the loss, f64 stays f64
        h = self.fcn(h)
        return h.astype(jnp.promote_types(h.dtype, jnp.float32))

    def extract_feature(self, x: jax.Array, *, train: bool = False):
        """(output, feature) pre-pool maps — reference models/stgcn.py:200-225."""
        x = self._to_ncvtm(x)
        h, N, M = self._stem(x, train)
        h = self._backbone(h, train)  # (N*M, T', V, 256)
        NM, t, v, c = h.shape
        feature = jnp.transpose(h.reshape(N, M, t, v, c), (0, 4, 2, 3, 1))
        out = self.fcn(h)  # 1x1 conv == per-position Dense
        output = jnp.transpose(out.reshape(N, M, t, v, -1), (0, 4, 2, 3, 1))
        return output, feature


def edge_importance_per_joint(edge_importance: list[np.ndarray]) -> np.ndarray:
    """Per-joint mean importance from per-layer edge masks.

    Functional port of reference models/stgcn.py:227-252
    (get_edge_importance_per_joint): sums incoming + outgoing edge weights per
    joint over all partitions and layers, normalised to max 1.
    """
    V = np.asarray(edge_importance[0]).shape[1]
    joint_scores = np.zeros(V)
    for importance in edge_importance:
        imp = np.asarray(importance)
        for k in range(imp.shape[0]):
            joint_scores += imp[k].sum(axis=0)
            joint_scores += imp[k].sum(axis=1)
    return joint_scores / joint_scores.max()


def create_stgcn_nucla(**overrides) -> STGCN:
    """NW-UCLA ST-GCN config (reference tools/train_stgcn_group.py:24-42)."""
    kwargs = dict(
        in_channels=3,
        num_class=10,
        num_point=20,
        num_person=1,
        graph="ucla",
        graph_args={"labeling_mode": "spatial"},
    )
    kwargs.update(overrides)
    return STGCN(**kwargs)
