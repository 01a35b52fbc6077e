"""Device mesh and sharding helpers.

The TPU-native replacement for the reference's GPU selection + DataParallel
wrap (processor/io.py:59-66,86-87; torchlight/torchlight/gpu.py): a named
jax.sharding.Mesh with axes

  data  — batch (DP) sharding; the NW-UCLA batch dimension is also how the
          edge-partitioned graph workload scales (SURVEY §2.3 item 2);
  model — channel/tensor sharding for wide layers (TP);

plus helpers for batch/replicated shardings. Multi-host initialisation uses
jax.distributed + per-host data shards (see tamgcn_tpu.parallel.sharded).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1, model_parallel: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh. data_parallel=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1 or n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide {n} devices")
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"data_parallel*model_parallel = {data_parallel}*{model_parallel} != {n}"
        )
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with batch-dim sharding (pads nothing; the
    loader guarantees batch % data_axis == 0 via drop_last).

    Single-device meshes skip NamedSharding: GSPMD-committed arrays take a
    dramatically slower dispatch path on the tunneled TPU backend (~150x,
    measured), and sharding is meaningless at size 1.
    """
    if mesh.size == 1:
        out = tuple(jax.device_put(a) for a in arrays)
    elif jax.process_count() > 1:
        # multi-host: each process holds its local shard of the global batch
        # (the Loader already splits indices per process); assemble global
        # arrays (the TPU-native replacement for per-GPU DataLoader scaling,
        # reference processor/processor.py:61-62)
        sh = batch_sharding(mesh)
        out = tuple(
            jax.make_array_from_process_local_data(sh, np.asarray(a))
            for a in arrays
        )
    else:
        sh = batch_sharding(mesh)
        out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
