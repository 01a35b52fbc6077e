"""TAM/CTR-GCN — channel-wise topology-refined GCN with the TAM offset branch.

TPU-native re-design of the reference model family in models/ctrgcn.py
(CTRGC :150-177, unit_gcn :196-263 incl. the TAM offset branch :219-223 and
:256-259, MultiScale_TemporalConv :72-147, unit_tcn :179-193,
TCN_GCN_unit :266-284, Model :287-374). Numerics match the reference
per-layer (see tests/test_parity_torch.py); the architecture does not:

  * activations are NTVC (batch, time, vertex, channel) so channels ride the
    128-lane axis — every 1x1 conv is an MXU matmul with no layout shuffles;
  * the CTR-GC hot path (SDDMM-shaped tanh(x1_u - x2_v), conv4 lift, alpha mix
    with the static partition, and the per-channel aggregation einsum) is a
    single fused op (`tamgcn_tpu.ops.ctr_gc_fused`) with a Pallas TPU kernel
    that keeps the (V, V, C) dynamic adjacency in VMEM;
  * BatchNorm uses flax running stats (momentum 0.9 == torch momentum 0.1,
    eps 1e-5), folded by XLA into the adjacent convs at inference.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.norm import BatchNorm

from ..graphs import get_graph
from ..ops import ctr_gc_fused
from ..ops.aggregation import unit_ctr_gc, unit_ctr_gc_conv3
from ..ops.inits import (
    fc_init,
    kaiming_normal_fan_out,
    kaiming_normal_fan_out_blocked,
    kaiming_normal_fan_out_dense,
)

# torch BatchNorm defaults: momentum 0.1 (-> flax 0.9), eps 1e-5.
BN = {"momentum": 0.9, "epsilon": 1e-5}


def _torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _rel_channels(in_channels: int, rel_reduction: int = 8) -> int:
    """Reference models/ctrgcn.py:155-158."""
    return 8 if in_channels in (3, 9) else in_channels // rel_reduction


class _Conv1x1Params(nn.Module):
    """Parameter-only twin of a 1x1 nn.Conv: declares the identical
    kernel/bias tree (same param names, shapes, and inits), so checkpoints
    are interchangeable between UnitGCN's fused-conv3 path (which consumes
    the raw weights via ops.unit_ctr_gc_conv3) and the unfused nn.Conv
    path — both live under the same "conv3" scope."""

    features: int
    in_features: int
    kernel_init: Any

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (1, 1, self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class CTRGC(nn.Module):
    """Channel-wise topology refinement unit (reference models/ctrgcn.py:150-177).

    Standalone single-subset form, kept as the oracle/teaching implementation;
    UnitGCN runs all three subsets through the packed `unit_ctr_gc` op.
    """

    in_channels: int
    out_channels: int
    rel_reduction: int = 8
    use_pallas: bool | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array, alpha: jax.Array) -> jax.Array:
        # x: (N, T, V, Cin); A: (V, V); alpha: (1,)
        rel_channels = _rel_channels(self.in_channels, self.rel_reduction)

        def conv1x1(features: int, name: str) -> nn.Conv:
            return nn.Conv(
                features,
                kernel_size=(1, 1),
                kernel_init=kaiming_normal_fan_out,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=name,
            )

        x1 = conv1x1(rel_channels, "conv1")(x).mean(axis=1)  # (N, V, R), T-pooled
        x2 = conv1x1(rel_channels, "conv2")(x).mean(axis=1)  # (N, V, R)
        x3 = conv1x1(self.out_channels, "conv3")(x)  # (N, T, V, Cout)
        w4 = self.param(
            "conv4_kernel",
            kaiming_normal_fan_out,
            (1, 1, rel_channels, self.out_channels),
        )
        b4 = self.param("conv4_bias", nn.initializers.zeros, (self.out_channels,))
        return ctr_gc_fused(
            x1, x2, x3, w4[0, 0], b4, alpha, A, use_pallas=self.use_pallas
        )


class UnitGCN(nn.Module):
    """3-subset CTR-GC layer with adaptive adjacency and the TAM offset branch.

    Reference models/ctrgcn.py:196-263; the offset branch
    `tanh(BN(Conv1x1(res - y)))` with zero-init conv (:219-223, :241-244,
    :256-259) is the TAM deviation from published CTR-GCN.
    """

    in_channels: int
    out_channels: int
    A: Any  # np.ndarray (num_subset, V, V)
    coff_embedding: int = 4
    adaptive: bool = True
    residual: bool = True
    use_pallas: bool | None = None
    dtype: Any = None
    # edge-partitioned graph parallelism: "ring" shards the joint axis over
    # the mesh's 'model' axis and pipelines the x3 boundary exchange against
    # the locally-held dynamic-adjacency rows
    # (parallel/graph_parallel.ring_unit_ctr_gc — the north-star case)
    graph_partition: str = "none"
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        A0 = np.asarray(self.A, np.float32)
        num_subset = A0.shape[0]
        if self.adaptive:
            A = self.param("PA", lambda key, shape: jnp.asarray(A0), A0.shape)
        else:
            A = jnp.asarray(A0)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))

        # The three subset branches' 1x1 convs are PACKED: one conv with the
        # per-subset kernels concatenated on the output axis (identical math,
        # one MXU matmul instead of three narrow ones), and the refinement +
        # aggregation of all subsets run as ONE fused op (ops.unit_ctr_gc).
        R = _rel_channels(self.in_channels)
        C = self.out_channels

        def packed_conv(features: int, blocks: int, name: str) -> nn.Conv:
            return nn.Conv(
                features,
                kernel_size=(1, 1),
                kernel_init=kaiming_normal_fan_out_blocked(blocks),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=name,
            )

        # conv12 commutes with the T pool (1x1 conv is linear:
        # mean_T(Wx + b) = W mean_T(x) + b, reference models/ctrgcn.py:173
        # computes conv-then-mean) — pooling FIRST does T x less matmul work
        # in both the forward and the e12 backward; same math to fp
        # reordering (the f64 trajectory tests bound the drift)
        xm = jnp.mean(x, axis=1, keepdims=True)          # (N, 1, V, Cin)
        e12 = packed_conv(2 * num_subset * R, 2 * num_subset, "conv12")(xm)
        e12 = e12[:, 0]                                   # (N, V, 2*S*R)
        N, V = e12.shape[0], e12.shape[1]
        x1s = e12[..., : num_subset * R].reshape(N, V, num_subset, R)
        x1s = jnp.transpose(x1s, (0, 2, 1, 3))  # (N, S, V, R)
        x2s = e12[..., num_subset * R:].reshape(N, V, num_subset, R)
        x2s = jnp.transpose(x2s, (0, 2, 1, 3))
        # per-slice fan_out=C (kaiming_normal_fan_out on the unpacked (R, C))
        w4s = self.param(
            "conv4_kernel", kaiming_normal_fan_out_dense, (num_subset, R, C)
        )
        b4s = self.param(
            "conv4_bias", nn.initializers.zeros, (num_subset, C)
        )
        if self.graph_partition == "ring":
            if self.mesh is None:
                raise ValueError("graph_partition='ring' requires a mesh")
            from ..parallel.graph_parallel import ring_unit_ctr_gc

            x3s = packed_conv(num_subset * C, num_subset, "conv3")(x)
            y = ring_unit_ctr_gc(
                x1s, x2s, x3s, w4s, b4s, alpha, A, self.mesh,
                use_pallas=self.use_pallas,
            )
        elif self.graph_partition in ("none", None):
            # conv3 routes through ops.unit_ctr_gc_conv3: by default the
            # plain conv3_matmul + round-4 unit_ctr_gc dispatch; with
            # TAMGCN_FUSE_CONV3=1 the conv3-VJP-fused custom op (built,
            # measured 45.6 vs 37.9 ms in-context, and retired — see
            # docs/KERNELS.md "Round 5"). Identical math either way; the
            # "conv3" param tree is the same nn.Conv tree in both branches.
            w3k, b3 = _Conv1x1Params(
                num_subset * C,
                self.in_channels,
                kaiming_normal_fan_out_blocked(num_subset),
                name="conv3",
            )()
            # mirror nn.Conv's promote_dtype: compute dtype wins, else the
            # common result type (keeps f64 equivalence runs f64)
            dt = self.dtype or jnp.result_type(x, w3k, b3)
            y = unit_ctr_gc_conv3(
                x.astype(dt), w3k[0, 0].astype(dt), b3.astype(dt),
                x1s, x2s, w4s, b4s, alpha, A, use_pallas=self.use_pallas,
            )
        else:
            raise ValueError(
                f"unknown graph_partition {self.graph_partition!r}"
            )
        # bn_init(self.bn, 1e-6): near-zero scale at init (reference :240)
        y = BatchNorm(
            use_running_average=not train,
            scale_init=nn.initializers.constant(1e-6),
            dtype=self.dtype,
            **BN,
            name="bn",
        )(y)

        if self.residual:
            if self.in_channels != self.out_channels:
                res = nn.Conv(
                    self.out_channels,
                    (1, 1),
                    kernel_init=kaiming_normal_fan_out,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype,
                    name="down_conv",
                )(x)
                res = BatchNorm(
                    use_running_average=not train, dtype=self.dtype, **BN,
                    name="down_bn",
                )(res)
            else:
                res = x
        else:
            res = 0.0

        # TAM offset branch: zero-init conv so it is a no-op at init
        diff = res - y
        offset = nn.Conv(
            self.out_channels,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="offset_conv",
        )(diff)
        offset = BatchNorm(
            use_running_average=not train, dtype=self.dtype, **BN,
            name="offset_bn",
        )(offset)
        offset = jnp.tanh(offset)

        return nn.relu(y + offset + res)


class TemporalConv(nn.Module):
    """k x 1 dilated temporal conv + BN (reference models/ctrgcn.py:52-69)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    bn_scale_init: Any = nn.initializers.ones
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        pad = (self.kernel_size + (self.kernel_size - 1) * (self.dilation - 1) - 1) // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, 1),
            strides=(self.stride, 1),
            kernel_dilation=(self.dilation, 1),
            padding=[(pad, pad), (0, 0)],
            kernel_init=kaiming_normal_fan_out,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(
            use_running_average=not train,
            scale_init=self.bn_scale_init,
            dtype=self.dtype,
            **BN,
            name="bn",
        )(x)


def _bn_weights_init(key, shape, dtype=jnp.float32):
    """weights_init BN scale: normal(1.0, 0.02) (reference models/ctrgcn.py:45-49)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class MultiScaleTCN(nn.Module):
    """Multi-branch temporal conv (reference models/ctrgcn.py:72-147).

    len(dilations) dilated-conv branches + a 1x1/maxpool branch + a plain 1x1
    branch, each out_channels // num_branches wide, concatenated on channels.
    """

    in_channels: int
    out_channels: int
    kernel_size: Any = 3  # int or list matching dilations
    stride: int = 1
    dilations: Sequence[int] = (1, 2, 3, 4)
    residual: bool = True
    residual_kernel_size: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        num_branches = len(self.dilations) + 2
        assert self.out_channels % num_branches == 0, (
            "# out channels should be multiples of # branches"
        )
        branch_channels = self.out_channels // num_branches
        kernel_size = self.kernel_size
        if isinstance(kernel_size, (list, tuple)):
            assert len(kernel_size) == len(self.dilations)
        else:
            kernel_size = [kernel_size] * len(self.dilations)
        n_dil = len(self.dilations)

        # TPU restructure (identical math to the reference branch list,
        # models/ctrgcn.py:93-124): the dilated + maxpool branches' entry
        # 1x1+BN+ReLU run PACKED as one conv over (n_dil+1)*branch_channels —
        # per-branch BN == packed BN because BN is per-channel — and all four
        # branches' OUTPUT BNs run as one BN over the concatenated channels.
        # Narrow per-branch convs (C/4 wide) waste the 128-lane axis; packing
        # cuts the block's conv+BN dispatch count from ~14 to ~6.
        prefix = nn.Conv(
            (n_dil + 1) * branch_channels,
            (1, 1),
            kernel_init=kaiming_normal_fan_out_blocked(n_dil + 1),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="prefix_conv",
        )(x)
        prefix = BatchNorm(
            use_running_average=not train,
            scale_init=_bn_weights_init,
            dtype=self.dtype,
            **BN,
            name="prefix_bn",
        )(prefix)
        prefix = nn.relu(prefix)

        outs = []
        for i, (ks, dilation) in enumerate(zip(kernel_size, self.dilations)):
            b = prefix[..., i * branch_channels:(i + 1) * branch_channels]
            pad = (ks + (ks - 1) * (dilation - 1) - 1) // 2
            b = nn.Conv(
                branch_channels,
                (ks, 1),
                strides=(self.stride, 1),
                kernel_dilation=(dilation, 1),
                padding=[(pad, pad), (0, 0)],
                kernel_init=kaiming_normal_fan_out,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"branch{i}_tconv_conv",
            )(b)
            outs.append(b)

        # maxpool branch (reference :113-119)
        b = prefix[..., n_dil * branch_channels:]
        b = nn.max_pool(
            b,
            window_shape=(3, 1),
            strides=(self.stride, 1),
            padding=[(1, 1), (0, 0)],
        )
        outs.append(b)

        # plain strided 1x1 branch (reference :121-124)
        b = nn.Conv(
            branch_channels,
            (1, 1),
            strides=(self.stride, 1),
            kernel_init=kaiming_normal_fan_out,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="pw_conv",
        )(x)
        outs.append(b)

        out = jnp.concatenate(outs, axis=-1)
        out = BatchNorm(
            use_running_average=not train,
            scale_init=_bn_weights_init,
            dtype=self.dtype,
            **BN,
            name="out_bn",
        )(out)

        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = TemporalConv(
                self.out_channels,
                self.residual_kernel_size,
                stride=self.stride,
                bn_scale_init=_bn_weights_init,
                dtype=self.dtype,
                name="residual",
            )(x, train=train)
        return out + res


class UnitTCN(nn.Module):
    """k x 1 temporal conv + BN residual unit (reference models/ctrgcn.py:179-193)."""

    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, 1),
            strides=(self.stride, 1),
            padding=[(pad, pad), (0, 0)],
            kernel_init=kaiming_normal_fan_out,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(
            use_running_average=not train, dtype=self.dtype, **BN, name="bn"
        )(x)


class TCNGCNUnit(nn.Module):
    """One GCN+TCN block: relu(tcn(gcn(x)) + residual(x)).

    Reference models/ctrgcn.py:266-284 — note dilations default [1,2] here,
    overriding MultiScale_TemporalConv's [1,2,3,4] (reference :267).
    """

    in_channels: int
    out_channels: int
    A: Any
    stride: int = 1
    residual: bool = True
    adaptive: bool = True
    kernel_size: int = 5
    dilations: Sequence[int] = (1, 2)
    use_pallas: bool | None = None
    dtype: Any = None
    graph_partition: str = "none"
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        y = UnitGCN(
            self.in_channels,
            self.out_channels,
            self.A,
            adaptive=self.adaptive,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            graph_partition=self.graph_partition,
            mesh=self.mesh,
            name="gcn1",
        )(x, train=train)
        y = MultiScaleTCN(
            self.out_channels,
            self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilations=self.dilations,
            residual=False,
            dtype=self.dtype,
            name="tcn1",
        )(y, train=train)
        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = UnitTCN(
                self.out_channels, kernel_size=1, stride=self.stride,
                dtype=self.dtype, name="residual",
            )(x, train=train)
        return nn.relu(y + res)


class CTRGCN(nn.Module):
    """Full TAM/CTR-GCN network (reference models/ctrgcn.py:287-374).

    10 TCN+GCN blocks, 64 -> 128 (stride 2 at l5) -> 256 (stride 2 at l8),
    data BN over (M, V, C) features, global (T, V) + person mean pooling,
    dropout, linear head. Call `.apply(..., method="extract_feature")` for the
    pre-pool feature tensor used by the cross-modal fusion model.
    """

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    graph: Any = None  # registry name ("ucla"/"ntu_rgb_d"), ndarray, or Graph
    graph_args: Any = None
    in_channels: int = 3
    drop_out: float = 0.0
    adaptive: bool = True
    base_channel: int = 64
    use_pallas: bool | None = None
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32
    # edge-partitioned graph parallelism over mesh's 'model' axis ("ring")
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
        bc = self.base_channel

        def block(in_ch, out_ch, stride=1, residual=True):
            return TCNGCNUnit(
                in_ch,
                out_ch,
                A,
                stride=stride,
                residual=residual,
                adaptive=self.adaptive,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                graph_partition=self.graph_partition,
                mesh=self.mesh,
            )

        self.l1 = block(self.in_channels, bc, residual=False)
        self.l2 = block(bc, bc)
        self.l3 = block(bc, bc)
        self.l4 = block(bc, bc)
        self.l5 = block(bc, bc * 2, stride=2)
        self.l6 = block(bc * 2, bc * 2)
        self.l7 = block(bc * 2, bc * 2)
        self.l8 = block(bc * 2, bc * 4, stride=2)
        self.l9 = block(bc * 4, bc * 4)
        self.l10 = block(bc * 4, bc * 4)

        self.data_bn = BatchNorm(dtype=self.dtype, **BN)
        self.fc = nn.Dense(
            self.num_class,
            kernel_init=fc_init(self.num_class),
            bias_init=_torch_linear_bias_init(bc * 4),
            dtype=self.dtype,
        )
        self.dropout = nn.Dropout(self.drop_out) if self.drop_out else None

    def _to_ncvtm(self, x: jax.Array) -> jax.Array:
        """Accept reference layouts (N,C,T,V,M) or (N,T,V*C) -> (N,C,T,V,M)."""
        if x.ndim == 3:
            N, T, VC = x.shape
            x = x.reshape(N, T, self.num_point, VC // self.num_point)
            x = jnp.transpose(x, (0, 3, 1, 2))[..., None]  # (N, C, T, V, 1)
        return x

    def _stem(self, x: jax.Array, train: bool):
        """data BN over flattened (M,V,C) features (reference :302, :330-332)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        N, C, T, V, M = x.shape
        h = jnp.transpose(x, (0, 2, 4, 3, 1)).reshape(N, T, M * V * C)
        h = self.data_bn(h, use_running_average=not train)
        h = h.reshape(N, T, M, V, C)
        h = jnp.transpose(h, (0, 2, 1, 3, 4)).reshape(N * M, T, V, C)
        return h, N, M

    def _backbone(self, h: jax.Array, train: bool) -> jax.Array:
        for blk in (self.l1, self.l2, self.l3, self.l4, self.l5,
                    self.l6, self.l7, self.l8, self.l9, self.l10):
            h = blk(h, train=train)
        return h

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = self._to_ncvtm(x)
        h, N, M = self._stem(x, train)
        h = self._backbone(h, train)  # (N*M, T', V, 4*bc)
        c_new = h.shape[-1]
        h = h.reshape(N, M, -1, c_new).mean(axis=2).mean(axis=1)  # (N, C)
        if self.dropout is not None:
            h = self.dropout(h, deterministic=not train)
        # logits in f32: the loss/softmax should not run in bf16
        # promote (not cast) so bf16 logits widen to f32 for the loss while
        # f64 equivalence runs stay f64 end-to-end
        h = self.fc(h)
        return h.astype(jnp.promote_types(h.dtype, jnp.float32))

    def extract_feature(self, x: jax.Array, *, train: bool = False):
        """Pre-pool features (N, C', T', V, M) — reference models/ctrgcn.py:350-374.

        Returns the feature tensor twice, matching the reference signature.
        """
        x = self._to_ncvtm(x)
        h, N, M = self._stem(x, train)
        h = self._backbone(h, train)  # (N*M, T', V, C')
        NM, Tp, V, Cp = h.shape
        h = h.reshape(N, M, Tp, V, Cp)
        h = jnp.transpose(h, (0, 4, 2, 3, 1))  # (N, C', T', V, M)
        return h, h


def create_ctrgcn_nucla(**overrides) -> CTRGCN:
    """NW-UCLA flagship config (reference config/nucla/gcn.yaml:20-27)."""
    kwargs = dict(
        num_class=10,
        num_point=20,
        num_person=1,
        graph="ucla",
        graph_args={"labeling_mode": "spatial"},
    )
    kwargs.update(overrides)
    return CTRGCN(**kwargs)
