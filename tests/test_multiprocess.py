"""Real multi-process (multi-host analog) integration test.

Spawns 2 jax.distributed CPU processes (tests/mp_worker.py): each loads its
per-process shard through the Loader, assembles the global batch via
shard_batch's make_array_from_process_local_data branch, and takes one train
step. The resulting loss must equal the single-process run on the same
global batch.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mp_worker.py")
    port = _free_port()
    out_file = str(tmp_path / "loss.txt")

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), out_file],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    multi_loss = float(open(out_file).read())

    # single-process oracle: same global batch, same model/seed, local mesh
    import jax

    from tamgcn_tpu.data import Loader
    from tamgcn_tpu.data.synthetic import SyntheticSkeletonFeeder
    from tamgcn_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from tests.mp_worker import one_step_loss

    feeder = SyntheticSkeletonFeeder(num_samples=8, split="val")
    x, label, _ = next(iter(Loader(feeder, batch_size=8, drop_last=True)))
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    gx, glabel = shard_batch(mesh, x, label.astype(np.int32))

    def variables_fn(model):
        v = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), jax.numpy.zeros_like(gx))
        )()
        return jax.device_put(v, jax.tree.map(lambda _: replicated(mesh), v))

    single_loss = one_step_loss(mesh, variables_fn, gx, glabel)
    assert multi_loss == pytest.approx(single_loss, rel=1e-6), (
        f"2-process loss {multi_loss} != single-process {single_loss}"
    )
