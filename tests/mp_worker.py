"""Worker for the 2-process jax.distributed integration test.

Each process: initialise jax.distributed, load its per-process shard of the
global batch through the Loader, assemble the global array via shard_batch's
make_array_from_process_local_data branch (parallel/mesh.py), run ONE train
step over the global (data-sharded) mesh, and have process 0 write the loss.

Usage: python tests/mp_worker.py <port> <process_id> <out_file>
"""
import os
import sys


def make_model():
    from flax import linen as nn

    class TinyMLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x.reshape(x.shape[0], -1)
            h = nn.relu(nn.Dense(32, name="d1")(h))
            return nn.Dense(10, name="d2")(h)

    return TinyMLP()


def one_step_loss(mesh, variables_fn, x, label):
    """One SGD step on the tiny model over `mesh`; returns the loss."""
    import jax
    import optax

    model = make_model()
    with mesh:
        variables = variables_fn(model)

        def loss_fn(params, xb, yb):
            out = model.apply(params, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                out, yb
            ).mean()

        def step(params, xb, yb):
            # global arrays must be ARGUMENTS (closing over non-addressable
            # arrays is not allowed in multi-controller jax)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            new_params = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
            return loss, new_params

        loss, _ = jax.jit(step)(variables, x, label)
    return float(loss)


def main():
    port, pid, out_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local per process

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tamgcn_tpu.data import Loader
    from tamgcn_tpu.data.synthetic import SyntheticSkeletonFeeder
    from tamgcn_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    feeder = SyntheticSkeletonFeeder(num_samples=8, split="val")
    loader = Loader(
        feeder, batch_size=8, shuffle=False, drop_last=True,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    x, label, _idx = next(iter(loader))
    assert x.shape[0] == 4  # per-process share of the global batch of 8

    mesh = make_mesh()  # all 4 global devices on the data axis
    gx, glabel = shard_batch(mesh, x, label.astype(np.int32))
    assert gx.shape[0] == 8  # global batch reassembled across processes

    shape, dtype = gx.shape, gx.dtype

    def variables_fn(model):
        # static-shape zeros: closing over the global batch array would bake
        # a non-addressable constant into the program
        def init():
            import jax.numpy as jnp

            return model.init(jax.random.PRNGKey(0), jnp.zeros(shape, dtype))

        return jax.jit(
            init,
            out_shardings=jax.tree.map(
                lambda _: replicated(mesh), jax.eval_shape(init)
            ),
        )()

    loss = one_step_loss(mesh, variables_fn, gx, glabel)
    if jax.process_index() == 0:
        with open(out_file, "w") as f:
            f.write(repr(loss))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
