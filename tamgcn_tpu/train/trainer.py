"""Recognition trainer: the config-driven train/eval runtime.

Capability parity with the reference processor stack (processor/processor.py
lifecycle :27-35 + epoch loop :107-168; recognition_rgb.py train/test/start
:48-126) rebuilt TPU-first:

  * one jitted train step (fwd + bwd + SGD update + BN stat update) over a
    named device mesh — batch sharded on the 'data' axis, params replicated
    (or 'model'-sharded for wide layers); the DataParallel wrap
    (processor/io.py:86-87) has no equivalent code here because GSPMD inserts
    the gradient all-reduce;
  * the LR schedule lives inside the optimiser (no host param-group pokes);
  * eval-interval / best-top1 checkpointing / per-sample score export /
    progress CSV semantics follow the reference;
  * orbax checkpoints with automatic resume.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data import Loader, feeder_accepts_seed, get_feeder
from ..data.loader import prefetch
from ..models import get_model
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .checkpoint import Checkpointer, filter_ignore, partial_update
from .optim import make_optimizer
from .packing import PackedTrainState, freeze_mask_for, make_fused_train_step
from .session import Session


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class RecognitionTrainer:
    """Skeleton-recognition train/eval driver (reference REC_Processor)."""

    def __init__(self, arg):
        self.arg = arg
        if getattr(arg, "sequence_parallel", False) and getattr(
            arg, "graph_partition", "none"
        ) != "none":
            # Both claim the mesh's 'model' axis: sp shards the TIME axis of
            # the activations while the ring shard_map expects the joint axis
            # sharded with T replicated (parallel/graph_parallel.py). The
            # combination would GSPMD-reshard at every block at best.
            raise ValueError(
                "--sequence_parallel and --graph_partition are mutually "
                "exclusive: both shard over the mesh's 'model' axis "
                "(sp shards time, the ring shards joints). Drop one."
            )
        if getattr(arg, "distributed", False) and jax.process_count() == 1:
            jax.distributed.initialize()
        if getattr(arg, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)
        self.session = Session(arg.work_dir, arg.save_log, arg.print_log)
        self.session.save_arg(arg)
        self.print_log = self.session.print_log

        self.mesh = make_mesh(arg.data_parallel, arg.model_parallel)
        self.print_log(
            f"mesh: data={self.mesh.shape['data']} model={self.mesh.shape['model']} "
            f"on {jax.default_backend()}"
        )

        self._load_data()
        self._load_model()
        self._load_optimizer()
        self._build_steps()

        self.ckpt = Checkpointer(os.path.join(arg.work_dir, "checkpoints"))
        self.meta = dict(epoch=0, best_t1=0.0, is_best=False)
        n_evals = max(1, arg.num_epoch // max(1, arg.eval_interval))
        self.progress = np.zeros([n_evals, 4])
        self.result_scores = None

    # -- construction --------------------------------------------------------

    def _load_data(self):
        arg = self.arg
        self.loaders = {}
        if arg.phase == "train":
            train_args = dict(arg.train_feeder_args)
            train_args.setdefault("debug", arg.debug)
            train_args.setdefault("split", "train")
            # the augmentation stream is keyed on the run seed (the feeder's
            # per-(seed, epoch, index) Philox); without this the aug always
            # ran on the feeder default seed regardless of --seed. Probed by
            # constructor signature — catching TypeError from __init__ could
            # swallow an unrelated error and silently drop the seed.
            if "seed" not in train_args and feeder_accepts_seed(arg.feeder):
                train_args["seed"] = arg.seed
            self.train_feeder = get_feeder(arg.feeder, **train_args)
            self.loaders["train"] = Loader(
                self.train_feeder,
                batch_size=arg.batch_size,
                shuffle=True,
                drop_last=True,
                seed=arg.seed,
                num_workers=arg.num_worker,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
        if arg.phase != "train":
            self._ensure_test_loader()

    def _ensure_test_loader(self):
        """Build the val feeder/loader on first use. Training must start
        without a loadable val split (the reference Processor never touches
        val until eval, processor/recognition_rgb.py:71-101) — so in the
        train phase this is deferred until the first eval interval."""
        if "test" in self.loaders:
            return
        arg = self.arg
        test_args = dict(arg.test_feeder_args)
        test_args.setdefault("split", "val")
        # key the test feeder on the run seed too: for the synthetic feeder
        # the seed selects the class prototypes shared between splits, so a
        # train feeder at --seed and a test feeder at the default seed were
        # DIFFERENT tasks (val stuck at/below chance while train memorised —
        # found by the round-5 bf16 convergence harness); for dataset
        # feeders the seed only keys the (eval: absent) aug stream
        if "seed" not in test_args and feeder_accepts_seed(arg.feeder):
            test_args["seed"] = arg.seed
        self.test_feeder = get_feeder(arg.feeder, **test_args)
        self.loaders["test"] = Loader(
            self.test_feeder,
            batch_size=arg.test_batch_size,
            shuffle=False,
            drop_last=False,
            seed=arg.seed,
            num_workers=arg.num_worker,
        )

    def _load_model(self):
        arg = self.arg
        model_args = dict(arg.model_args)
        if arg.use_pallas is not None:
            model_args.setdefault("use_pallas", arg.use_pallas)
        if getattr(arg, "graph_partition", "none") != "none":
            # edge-partitioned graph parallelism over the mesh's model axis
            # (parallel/graph_parallel.py); the model shards its joint axis
            model_args.setdefault("graph_partition", arg.graph_partition)
            model_args.setdefault("mesh", self.mesh)
        self.model = get_model(arg.model, **model_args)

        sample = self._example_batch()
        rng = jax.random.PRNGKey(arg.seed)
        with self.mesh:
            variables = jax.jit(partial(self.model.init, train=False))(rng, *sample)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        self.print_log(f"model: {arg.model} ({n_params/1e6:.2f}M params)")

        if arg.weights:
            params, batch_stats = self._load_weights(params, batch_stats)
        self._init_params = params
        self._init_batch_stats = batch_stats

    def _example_batch(self):
        """Zero batch matching the feeder's model inputs (all items except
        the trailing label and index/name). Shapes come from the train
        feeder in the train phase — a pure training run must not require the
        val split to exist (reference trains without touching val until
        eval, processor/recognition_rgb.py:103-126)."""
        feeder = (
            self.train_feeder if self.arg.phase == "train" else self.test_feeder
        )
        first = feeder[0]
        n = max(self.mesh.size, 2)
        return tuple(
            jnp.zeros((n,) + np.asarray(a).shape, np.asarray(a).dtype)
            for a in first[:-2]
        )

    def _load_weights(self, params, batch_stats):
        """--weights: an .npz of a reference-exported torch state dict, or an
        orbax checkpoint dir (reference io.py:72-75 + torchlight :57-90)."""
        arg = self.arg
        self.print_log(f"Load weights from {arg.weights}")
        if arg.weights.endswith(".npz"):
            variables = self._import_npz(dict(np.load(arg.weights)))
            new_params, new_stats = variables["params"], variables["batch_stats"]
        else:
            ckptr = Checkpointer(arg.weights)
            # checkpoints carry {params, batch_stats, step}; step is the
            # resume counter and irrelevant for a weight load
            tree = ckptr.restore(
                "best" if ckptr.exists("best") else f"epoch{ckptr.latest_epoch()}",
                target={
                    "params": params,
                    "batch_stats": batch_stats,
                    "step": np.zeros((), np.int32),
                },
            )
            new_params, new_stats = tree["params"], tree["batch_stats"]
        new_params = filter_ignore(new_params, arg.ignore_weights)
        new_stats = filter_ignore(new_stats, arg.ignore_weights)
        params = partial_update(params, new_params, log=self.print_log)
        batch_stats = partial_update(batch_stats, new_stats, log=self.print_log)
        return params, batch_stats

    def _import_npz(self, state: dict):
        """Map a reference-exported torch state-dict .npz onto this model's
        variable tree, dispatched on the configured model family (the
        cross-modal trainer overrides this for its fusion-specific
        GCN-submodule loading)."""
        from ..utils.torch_import import (
            import_ctrgcn_state_dict,
            import_resnet_state_dict,
            import_stgcn_state_dict,
        )

        # exact-match dispatch on the registered model name (substring
        # matching would mis-route any future composite name containing
        # 'stgcn'/'resnet'); unknown names fail loudly rather than silently
        # picking the wrong importer
        importers = {
            "ctrgcn": import_ctrgcn_state_dict,
            "models.ctrgcn.Model": import_ctrgcn_state_dict,
            "stgcn": import_stgcn_state_dict,
            "models.stgcn.Model": import_stgcn_state_dict,
            "resnet_only": import_resnet_state_dict,
            "models.resnet_only.Model": import_resnet_state_dict,
        }
        name = str(getattr(self.arg, "model", "ctrgcn"))
        try:
            return importers[name](state)
        except KeyError:
            raise ValueError(
                f"no torch state-dict importer registered for model {name!r}; "
                f"known: {sorted(importers)}"
            ) from None

    def _load_optimizer(self):
        arg = self.arg
        steps_per_epoch = max(1, len(self.loaders["train"])) if "train" in self.loaders else 1
        self.steps_per_epoch = steps_per_epoch
        self.tx = make_optimizer(
            arg.optimizer,
            arg.base_lr,
            steps_per_epoch=steps_per_epoch,
            step=arg.step,
            lr_decay_rate=arg.lr_decay_rate,
            warm_up_epoch=arg.warm_up_epoch,
            nesterov=arg.nesterov,
            weight_decay=arg.weight_decay,
        )
        # frozen subtrees get a zero update (and thus no weight decay) —
        # the functional equivalent of requires_grad=False
        # (reference models/resnet_gcn_attention.py:24-26); applied as a flat
        # mask on the fused update (train/packing.py)
        self._freeze_mask = freeze_mask_for(
            self._init_params, tuple(arg.freeze_params or ())
        )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self._init_params,
            batch_stats=self._init_batch_stats,
            opt_state=None,  # lives in the packed state (flat-space optax)
        )

    # -- jitted steps ----------------------------------------------------------

    def _build_steps(self):
        model = self.model

        def loss_fn(params, batch_stats, inputs, label, dropout_rng, train):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            if train:
                out, mutated = model.apply(
                    variables, *inputs, train=True,
                    mutable=["batch_stats"], rngs={"dropout": dropout_rng},
                )
                new_stats = mutated.get("batch_stats", batch_stats)
            else:
                out = model.apply(variables, *inputs, train=False)
                new_stats = batch_stats
            loss = optax.softmax_cross_entropy_with_integer_labels(out, label).mean()
            return loss, (out, new_stats)

        def eval_step(state: TrainState, inputs, label):
            loss, (logits, _) = loss_fn(
                state.params, state.batch_stats, inputs, label,
                jax.random.PRNGKey(0), False,
            )
            return loss, logits

        # Two step implementations share this ONE loss_fn (no semantic fork):
        #   * model_parallel == 1 — the fused/packed step (train/packing.py):
        #     the state crosses the jit boundary as flat buffers and the
        #     optimiser runs in flat space. Unpacked, the step's I/O is
        #     ~2900 buffers and the SGD chain compiles to several HLO ops
        #     per param leaf — measured 80 ms/step vs ~4 ms fused on the
        #     tunneled v5e at batch 64.
        #   * model_parallel > 1 — the flat buffer carries a single sharding
        #     and cannot express per-param TP layouts, so the trainer
        #     auto-selects the unpacked pytree step with the
        #     DEFAULT_TP_RULES NamedShardings (parallel/sharded.py).
        self._tp = self.mesh.shape["model"] > 1
        if self._tp:
            self._build_tp_step(loss_fn)
        else:
            train_step, pstate0, self._unravel_params, self._unravel_stats = (
                make_fused_train_step(
                    lambda p, s, ins, lab, rng: loss_fn(p, s, ins, lab, rng, True),
                    self.tx,
                    self.state.params,
                    self.state.batch_stats,
                    freeze_mask=self._freeze_mask,
                )
            )
            self.pstate = pstate0
            if self.mesh.size > 1:
                self.pstate = jax.device_put(self.pstate, replicated(self.mesh))
            self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(eval_step)
        # --fast_eval: route test-phase inference through the fused GCN+TCN
        # block kernel (ops/pallas/gcn_tcn_block.py) — eval BN folds to
        # affine, so a whole TCN_GCN_unit runs in one VMEM pass. CTRGCN only.
        from ..models.ctrgcn import CTRGCN

        fast_eval = getattr(self.arg, "fast_eval", False)
        if fast_eval and not isinstance(model, CTRGCN):
            self.print_log(
                "WARNING: --fast_eval only applies to CTRGCN models; "
                f"ignored for {type(model).__name__} (ordinary eval path)."
            )
        if fast_eval and getattr(self.arg, "sequence_parallel", False):
            raise ValueError(
                "--fast_eval and --sequence_parallel are mutually exclusive: "
                "the fused block kernels have no partitioning spec for a "
                "sharded time axis. Drop one of the flags."
            )
        if fast_eval and isinstance(model, CTRGCN):
            from ..models.ctrgcn_infer import make_fast_eval_fn

            fast_fn = make_fast_eval_fn(model)

            def fast_eval_step(state: TrainState, inputs, label):
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                logits = fast_fn(variables, *inputs)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, label
                ).mean()
                return loss, logits

            self.eval_step = jax.jit(fast_eval_step)

    def _build_tp_step(self, loss_fn):
        """Tensor-parallel train step: unpacked pytree state, per-param
        NamedShardings from DEFAULT_TP_RULES (fc head / attention MLP over
        the 'model' axis), GSPMD collectives over ICI."""
        from ..parallel.sharded import DEFAULT_TP_RULES, param_shardings

        tx = self.tx
        frozen = tuple(self.arg.freeze_params or ())

        def train_step(state: TrainState, inputs, label, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)

            def lf(params):
                return loss_fn(
                    params, state.batch_stats, inputs, label, dropout_rng, True
                )

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            if frozen:
                # zero updates (incl. weight decay) for frozen prefixes —
                # same semantics as the packed path's freeze_mask
                updates = jax.tree_util.tree_map_with_path(
                    lambda p, u: (
                        jnp.zeros_like(u)
                        if "/".join(str(k.key) for k in p).startswith(frozen)
                        else u
                    ),
                    updates,
                )
            new_params = optax.apply_updates(state.params, updates)
            acc = (logits.argmax(-1) == label).mean()
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                loss,
                acc,
            )

        self._p_shard = param_shardings(
            self.mesh, self._init_params, DEFAULT_TP_RULES
        )
        self._s_shard = param_shardings(self.mesh, self._init_batch_stats)
        params = jax.device_put(self._init_params, self._p_shard)
        stats = jax.device_put(self._init_batch_stats, self._s_shard)
        with self.mesh:
            opt_state = jax.jit(self.tx.init)(params)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=opt_state,
        )
        self.pstate = self.state
        self.train_step = jax.jit(train_step, donate_argnums=(0,))

    def _sync_state(self):
        """Materialise the pytree view (self.state) from the step state."""
        if self._tp:
            self.state = self.pstate
            return
        self.state = TrainState(
            step=self.pstate.step,
            params=self._unravel_params(self.pstate.flat_params),
            batch_stats=self._unravel_stats(self.pstate.flat_stats),
            opt_state=self.pstate.opt_state,
        )

    def _repack_state(self):
        """Push self.state (after weight load / resume) into the step state."""
        if self._tp:
            # re-apply the TP shardings to host-restored trees; a restored
            # opt_state enters replicated and GSPMD re-shards it on the
            # first step
            self.pstate = self.state = self.state.replace(
                step=jnp.asarray(self.state.step, jnp.int32),
                params=jax.device_put(self.state.params, self._p_shard),
                batch_stats=jax.device_put(self.state.batch_stats, self._s_shard),
                opt_state=(
                    self.state.opt_state
                    if self.state.opt_state is not None
                    else self.pstate.opt_state
                ),
            )
            return
        from ..train.packing import _ravel_padded

        self.pstate = self.pstate.replace(
            step=jnp.asarray(self.state.step, jnp.int32),
            flat_params=_ravel_padded(self.state.params)[0],
            flat_stats=_ravel_padded(self.state.batch_stats)[0],
            opt_state=(
                self.state.opt_state
                if self.state.opt_state is not None
                else self.pstate.opt_state
            ),
        )
        if self.mesh.size > 1:
            self.pstate = jax.device_put(self.pstate, replicated(self.mesh))

    # -- epoch loops -------------------------------------------------------------

    def train_epoch(self, epoch: int):
        arg = self.arg
        loader = self.loaders["train"]
        loader.set_epoch(epoch)
        rng = jax.random.PRNGKey(arg.seed + 1)
        losses, accs = [], []
        self.session.init_timer("dataloader", "device", "statistics")
        t0 = time.time()
        nseen = 0

        sp_train = (
            getattr(arg, "sequence_parallel", False)
            and self.mesh.shape.get("model", 1) > 1
        )

        def put(batch):
            """Producer-thread H2D: overlaps the next batch's transfer +
            augmentation with the current step (loader.prefetch). Under
            --sequence_parallel the skeleton inputs' TIME axis additionally
            rides the 'model' mesh axis for the TRAIN step too — GSPMD
            inserts the temporal-conv halo exchanges, and the batch-stat BN
            reductions stay global (mean over a sharded axis is partitioned
            with the matching collectives), so the sp step is numerically
            the replicated step (tests/test_sharding.py)."""
            inputs, label = batch[:-2], batch[-2]
            if sp_train:
                sharded = self._sp_put(inputs, label)
            else:
                sharded = shard_batch(
                    self.mesh, *inputs, label.astype(np.int32)
                )
            return sharded[:-1], sharded[-1]

        for it, (inputs, label) in enumerate(prefetch(iter(loader), put)):
            self.session.check_time("dataloader")
            self.pstate, loss, acc = self.train_step(
                self.pstate, inputs, label, rng
            )
            self.session.check_time("device")
            losses.append(loss)
            accs.append(acc)
            nseen += label.shape[0]
            if it % arg.log_interval == 0:
                self.print_log(
                    f"\tIter {it}/{len(loader)} | loss: {float(loss):.4f} "
                    f"| lr schedule step {epoch * self.steps_per_epoch + it}"
                )
            self.session.check_time("statistics")
        mean_loss = float(np.mean(jax.device_get(losses)))
        mean_acc = float(np.mean(jax.device_get(accs)))
        dt = time.time() - t0
        self.print_log(
            f"\tTraining loss: {mean_loss:.4f} | acc: {mean_acc:.2%} "
            f"| {nseen/dt:.1f} samples/s"
        )
        self.session.print_timer()
        return mean_loss

    def _sp_put(self, inputs, label):
        """--sequence_parallel eval placement: the skeleton inputs' TIME axis
        rides the 'model' mesh axis (P('data', None, 'model') for the
        (N,C,T,V,M) layout, P('data', 'model') for the flat (N,T,V*C) feeder
        layout); GSPMD inserts the temporal-conv halo exchanges over ICI
        (SURVEY §5 long-context; counterpart of __graft_entry__'s sp
        forward, now reachable from the trainer)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        m = self.mesh.shape["model"]

        def spec(a):
            if a.ndim == 5:
                if a.shape[2] % m:
                    raise ValueError(
                        f"--sequence_parallel: time axis T={a.shape[2]} is "
                        f"not divisible by the 'model' mesh axis ({m}); pick "
                        "a model_parallel that divides T or pad the clips."
                    )
                return P("data", None, "model")
            if a.ndim == 3:
                if a.shape[1] % m:
                    raise ValueError(
                        f"--sequence_parallel: time axis T={a.shape[1]} is "
                        f"not divisible by the 'model' mesh axis ({m}); pick "
                        "a model_parallel that divides T or pad the clips."
                    )
                return P("data", "model")
            return P("data")

        arrs = tuple(inputs) + (label.astype(np.int32),)
        specs = tuple(spec(a) for a in inputs) + (P("data"),)
        return tuple(
            jax.device_put(a, NamedSharding(self.mesh, s))
            for a, s in zip(arrs, specs)
        )

    def test_epoch(self):
        self._ensure_test_loader()
        loader = self.loaders["test"]
        losses, scores, labels = [], [], []
        sp_eval = (
            getattr(self.arg, "sequence_parallel", False)
            and self.mesh.shape.get("model", 1) > 1
        )

        def put(batch):
            inputs, label = batch[:-2], batch[-2]
            n = label.shape[0]
            # pad the tail batch to a mesh-divisible size by tiling (np.resize
            # wraps, so this works even when pad > n, e.g. a 3-sample tail on
            # an 8-device mesh)
            pad = (-n) % self.mesh.size
            if pad:
                inputs = tuple(
                    np.concatenate(
                        [a, np.resize(a, (pad,) + a.shape[1:])], axis=0
                    )
                    for a in inputs
                )
                label = np.concatenate(
                    [label, np.resize(label, (pad,))], axis=0
                )
            if sp_eval:
                sharded = self._sp_put(inputs, label)
            else:
                sharded = shard_batch(
                    self.mesh, *inputs, label.astype(np.int32)
                )
            return sharded[:-1], sharded[-1], n, np.asarray(batch[-2])

        for ins, l, n, label_np in prefetch(iter(loader), put):
            loss, logits = self.eval_step(self.state, ins, l)
            # keep results on device; one bulk fetch below (each early
            # device_get costs a full dispatch-sync round trip)
            losses.append(loss)
            scores.append(logits[:n])
            labels.append(label_np)
        losses = [float(x) for x in jax.device_get(losses)]
        scores = np.concatenate(jax.device_get(scores))
        labels = np.concatenate(labels)
        mean_loss = float(np.mean(losses))
        rank = scores.argsort(axis=1)

        def topk(k: int) -> float:
            return float(
                np.mean([l in rank[i, -k:] for i, l in enumerate(labels)])
            )

        # honour --show_topk (reference processor prints every requested k);
        # top-1/top-5 keep their structural roles (best-model policy, CSV)
        for k in getattr(self.arg, "show_topk", [1, 5]):
            self.print_log(f"\tTop{k}: {topk(k):.2%}")
        top1 = topk(1)
        top5 = topk(5)
        self.result_scores = scores
        self.result_labels = labels
        return mean_loss, top1, top5

    # -- lifecycle ---------------------------------------------------------------

    def start(self):
        arg = self.arg
        self.print_log(f"Parameters:\n{vars(arg)}\n")
        if arg.phase == "train":
            self._train_phase()
        else:
            self._test_phase()

    def _train_phase(self):
        arg = self.arg
        start_epoch = arg.start_epoch
        if getattr(arg, "resume", False):
            start_epoch = max(start_epoch, self.resume())
            self._repack_state()
        if arg.profile_dir:
            jax.profiler.start_trace(arg.profile_dir)
        try:
            for epoch in range(start_epoch, arg.num_epoch):
                self.meta["epoch"] = epoch
                self.print_log(f"Training epoch: {epoch + 1}")
                train_loss = self.train_epoch(epoch)
                last = epoch + 1 == arg.num_epoch
                if (epoch + 1) % arg.eval_interval == 0 or last:
                    self._sync_state()
                    self.print_log(f"Eval epoch: {epoch + 1}")
                    test_loss, top1, top5 = self.test_epoch()
                    self.print_log(
                        f"\tEvaluation Acc: {top1:.2%} (top5 {top5:.2%}) "
                        f"loss {test_loss:.4f}"
                    )
                    row = min(epoch // max(1, arg.eval_interval),
                              len(self.progress) - 1)
                    self.progress[row] = [train_loss, test_loss, top1, top5]
                    if top1 > self.meta["best_t1"]:
                        self.meta["best_t1"] = top1
                        self.print_log(f"Save best Top1 at epoch:{epoch + 1}")
                        self._save_checkpoint("best")
                        self._save_scores(f"test_result_epoch{epoch + 1}.pkl")
                    if (epoch + 1) % arg.save_interval == 0 or last:
                        self._save_checkpoint(f"epoch{epoch + 1}")
            self.session.save_progress_csv(self.progress)
            self.print_log(f"Best Top1: {self.meta['best_t1']:.2%}")
        finally:
            if arg.profile_dir:
                jax.profiler.stop_trace()

    def _test_phase(self):
        arg = self.arg
        if arg.weights is None:
            raise ValueError("Please appoint --weights.")
        self.print_log(f"Model:   {arg.model}.")
        self.print_log(f"Weights: {arg.weights}.")
        self.print_log("Evaluation Start:")
        test_loss, top1, top5 = self.test_epoch()
        self.print_log(
            f"\tEvaluation Acc: {top1:.2%} (top5 {top5:.2%}) loss {test_loss:.4f}"
        )
        if arg.save_result:
            self._save_scores("test_result.pkl")

    def _save_scores(self, filename: str):
        """Per-sample score pickle keyed by sample name
        (reference processor.py:162-168)."""
        names = getattr(self.test_feeder, "sample_name", None)
        if names is None:
            names = list(range(len(self.result_scores)))
        result = dict(zip(names, self.result_scores))
        self.session.save_pkl(result, filename)
        self.print_log(f"saved scores: {filename}")

    def _save_checkpoint(self, name: str):
        tree = jax.device_get(
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "step": self.state.step,
            }
        )
        self.ckpt.save(name, tree)
        if name.startswith("epoch") and self.state.opt_state is not None:
            # epoch checkpoints are resume points: persist optimiser state
            # (flat-space momentum buffers, train/packing.py) as a sibling
            # tree so the weight tree keeps the plain {params, batch_stats,
            # step} layout weight-loading consumers expect
            self.ckpt.save(
                f"{name}_opt",
                {"opt_state": jax.device_get(self.state.opt_state)},
            )
        self.print_log(f"checkpoint saved: {name}")

    def resume(self):
        """Restore the latest epoch checkpoint if present; returns next epoch."""
        latest = self.ckpt.latest_epoch()
        if latest is None:
            return self.arg.start_epoch
        tree = self.ckpt.restore(
            f"epoch{latest}",
            target=jax.device_get(
                {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                    "step": self.state.step,
                }
            ),
        )
        rep = replicated(self.mesh) if self.mesh.size > 1 else None
        put = (lambda t: jax.device_put(t, rep)) if rep else jax.device_put
        self.state = self.state.replace(
            params=put(tree["params"]),
            batch_stats=put(tree["batch_stats"]),
            step=jnp.asarray(tree["step"]),
        )
        if self.ckpt.exists(f"epoch{latest}_opt"):
            opt = self.ckpt.restore(
                f"epoch{latest}_opt",
                target={"opt_state": jax.device_get(self.pstate.opt_state)},
            )["opt_state"]
            self.state = self.state.replace(opt_state=put(opt))
        self.print_log(f"resumed from epoch{latest}")
        return latest
