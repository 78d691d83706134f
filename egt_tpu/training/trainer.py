"""The training engine.

TPU-native re-design of the reference's `TrainingBase` (`lib/training/training_base.py`):
the same config surface, run-directory layout, save-best / reduce-on-plateau / resume
semantics and CLI entry points — but the hot loop is a single jit-compiled train step
over a `jax.sharding.Mesh` (batch sharded over the 'data' axis, params replicated; XLA
emits the gradient all-reduce over ICI), with orbax checkpointing and host-side
epoch-level schedule logic.

Run directory (mirrors `training_base.py:183-190,220-224,315-319`):
    models/<dataset>/<model_name>/
        config/config.json, config/config_input.json
        summary/summary.txt          (parameter-count summary)
        logs/                        (JSONL metrics + optional TensorBoard events)
        checkpoint/                  (orbax, max_to_keep=1 + train-state sidecar)
        saved/<...>epochNNNN.npz     (save-best weight snapshots)
        saved/<model_name>.npz       (final weights)
        predictions/<split>_evals.txt
"""

from __future__ import annotations

import functools
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.prefetch import Prefetcher
from ..models.graph_model import EGTGraphModel, GraphModelConfig
from ..parallel import mesh as meshlib
from ..utils.hparams import Derived, HParams, join_path, save_config_to_file
from . import checkpoint as ckpt
from . import metrics as M
from . import optim
from . import schedules


def _count_params(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))


def _merge_stats_updates(params, stats_updates: dict, prefix=("stack",)):
    """Functionally merge BatchNorm moving-stat updates (path-keyed) into params."""
    if not stats_updates:
        return params

    def set_path(tree, path, value):
        key = path[0]
        if len(path) == 1:
            new = {**tree[key], **value}
        else:
            new = set_path(tree[key], path[1:], value)
        if isinstance(tree, dict):
            out = dict(tree)
            out[key] = new
            return out
        out = list(tree)
        out[key] = new
        return out

    for path, value in stats_updates.items():
        params = set_path(params, tuple(prefix) + tuple(path), value)
    return params


class TrainingBase:
    """Config-driven training/eval engine; schemes subclass this."""

    def __init__(self, config: dict | None = None):
        self.config_input = config
        self.config = self.get_default_config().strict_update(config)
        self.state = self.get_default_state()
        self.pred_flag = False
        self.eval_flag = False
        self.model: EGTGraphModel | None = None
        self.params = None
        self.opt_state = None
        self.mesh = None

    # --------------------------------------------------------------- config surface

    def get_default_config(self) -> HParams:
        c = HParams(
            scheme=None,
            model_name="unnamed_model",
            distributed=False,
            batch_size=Derived(lambda c: 32 if c.distributed else 128),
            initial_lr=5e-4,
            gradient_clipval=None,
            num_epochs=1000,
            dataset_path="datasets/gnn_benchmark.h5",
            save_path=Derived(lambda c: join_path("models", c.model_name)),
            checkpoint_path=Derived(lambda c: join_path(c.save_path, "checkpoint")),
            log_path=Derived(lambda c: join_path(c.save_path, "logs")),
            config_path=Derived(lambda c: join_path(c.save_path, "config")),
            summary_path=Derived(lambda c: join_path(c.save_path, "summary")),
            saved_model_path=Derived(
                lambda c: join_path(c.save_path, "saved", c.model_name)),
            rlr_factor=0.5,
            rlr_patience=10,
            rlr_monitor=Derived(lambda c: c.save_best_monitor),
            min_lr_factor=0.01,
            stopping_lr=0.0,
            steps_per_epoch=None,
            validation_steps=None,
            save_best=True,
            save_when=Derived(
                lambda c: "" if not c.save_best else
                "epoch;" + c.save_best_monitor +
                "<=save_best_value;epoch{epoch:0>4d}"),
            save_best_monitor="val_loss",
            stopping_patience=0,
            predictions_path=Derived(
                lambda c: join_path(c.save_path, "predictions")),
            weight_file=":",
            prediction_bmult=2,
            optimizer="adam",
            # --- TPU-native extensions (not in the reference config surface)
            seed=42,
            # TPU fast path ON by default (VERDICT r1 item 3): bf16 compute
            # with f32 islands is validated convergence-neutral at the real
            # egt_spe_500k recipe (synthetic-molecular campaign: best val MAE
            # 0.0626/0.0633 over 2 seeds vs the TF reference's 0.0632 on the
            # same corpus — DESIGN_NOTES "Round-2 convergence"); 'auto'
            # resolves the attention kernel per traced shape
            compute_dtype="bfloat16",    # 'float32' | 'bfloat16'
            use_pallas="auto",           # fused attention kernel; True|False|"auto"
            use_pallas_edge=False,       # fused edge block (ops/edge_block_pallas.py)
            # whole-layer megakernel: "auto" (default) takes it at traced
            # shapes where the measured matrix says it beats every other
            # path AND use_pallas is "auto" too; True pins it; False never
            use_pallas_layer="auto",
            attention_impl="auto",       # non-Pallas attention: einsum|vpu|auto
            attn_chain_f32=True,         # False: bf16 logits/softmax/gate chain
            num_devices=None,            # limit the mesh; None = all local devices
            reload_on_nan=False,         # reference `relod_on_nan` capability
            log_tensorboard=True,
            log_interval=60,             # seconds between in-epoch progress lines
            length_buckets=None,         # pad-length buckets for dynamic datasets
            remat=False,                 # per-layer rematerialization
            edge_partition=1,            # shard the NxN grid over this many chips
            steps_per_dispatch=1,        # train steps per device dispatch (lax.scan)
            # microbatches accumulated per optimizer step (lax.scan inside the
            # jitted step; gradients averaged, one optax update). Effective
            # batch = batch_size * grad_accum_steps — lets the shipped pod
            # recipes (e.g. PCQM4Mv2 EGT-Large batch 1024, warmup 15000
            # optimizer steps) run faithfully on fewer chips. Composes with
            # steps_per_dispatch and the dp/sp meshes.
            grad_accum_steps=1,
            profile_dir=None,            # capture a device trace of steps 10..15
        )
        return c

    def get_default_state(self) -> dict:
        return {
            "current_epoch": 0,
            "global_step": 0,
            "lr": None,  # filled at load_model
            **schedules.default_plateau_state(),
        }

    # ------------------------------------------------------------- scheme overrides

    def get_dataset(self, splits):
        raise NotImplementedError

    def get_model_config(self) -> GraphModelConfig:
        raise NotImplementedError

    def loss_and_metrics(self, pred, target, mask, sample_mask):
        """Returns (scalar_loss, {metric_name: (sum, count)}). Override per scheme."""
        raise NotImplementedError

    # ------------------------------------------------------------------ data access

    def load_data(self, splits=("training", "validation")):
        self.dataset = self.get_dataset(list(splits))
        for s in splits:
            n = self.dataset.num_records(s)
            print(f"split {s}: {n} records", flush=True)
        self.splits = list(splits)
        self.pad_len = self.dataset.pad_length(self.splits)

    def _stack_accum(self, src, A: int):
        """Stack groups of A consecutive SAME-SHAPE host microbatches along a
        new leading accumulation axis. Shape changes (length buckets) and the
        epoch tail flush short stacks (a < A) — those compile a second, tail-
        sized program (at most one extra shape per distinct tail length)."""
        group, gshape = [], None

        def stack(items):
            return {k: np.stack([g[k] for g in items]) for k in items[0]}

        for b in src:
            bshape = tuple(sorted((k, v.shape) for k, v in b.items()))
            if group and bshape != gshape:
                yield stack(group)
                group = []
            group.append(b)
            gshape = bshape
            if len(group) == A:
                yield stack(group)
                group = []
        if group:
            yield stack(group)

    def _group_batches(self, src, K: int, bsh_k, A: int = 1, bsh_a=None):
        """Yield ('single', device_batch) or ('multi', stacked_device_batch):
        groups of K SAME-SHAPE host batches become one transfer + one
        dispatch; shape changes (length buckets) and remainders fall back to
        the single-step program. Shared by the train and eval loops.

        With grad accumulation (A > 1) each unit is a stack of A microbatches
        (leading axis A); 'multi' units then carry shape (K, A, ...)."""
        if A > 1:
            src = self._stack_accum(src, A)
        single_sh = bsh_a if A > 1 else None
        group, gshape = [], None

        def put_single(b):
            if single_sh is not None:
                return jax.device_put(b, single_sh)
            return meshlib.put_global_batch(b, self.mesh)

        def flush_single(items):
            for b in items:
                yield "single", put_single(b)

        for b in src:
            if K == 1:
                yield "single", put_single(b)
                continue
            bshape = tuple(sorted((k, v.shape) for k, v in b.items()))
            if group and bshape != gshape:
                yield from flush_single(group)
                group = []
            group.append(b)
            gshape = bshape
            if len(group) == K:
                stacked = {k: np.stack([g[k] for g in group])
                           for k in group[0]}
                yield "multi", jax.device_put(stacked, bsh_k)
                group = []
        yield from flush_single(group)

    def _batches(self, split: str, shuffle: bool, epoch: int = 0):
        # the reference applies batch_size*prediction_bmult only when the run
        # itself is an eval/predict run (`training_base.py:202-207`); during
        # training every split — including in-training validation — uses the
        # plain batch_size (also keeps (b,L,L) activation memory flat)
        bmult = self.config.prediction_bmult \
            if (self.eval_flag or self.pred_flag) else 1
        bs = self.config.batch_size * bmult
        return self.dataset.batches(
            split, bs, shuffle=shuffle, seed=self.config.seed, epoch=epoch,
            pad_len=self.pad_len, buckets=self.config.length_buckets)

    # ----------------------------------------------------------------- model build

    def load_model(self):
        cfg = self.get_model_config()
        cfg.max_length = self.pad_len
        up = self.config.use_pallas
        # 'auto' is resolved per traced shape inside the model from the
        # measured matrix (CROSSOVER_MATRIX.json via ops/crossover.py): with
        # attention_impl also 'auto' the joint rule picks the argmin of
        # {Pallas kernel, einsum, vpu} per shape, so length buckets each pick
        # their best path
        cfg.fused_attention = "auto" if up == "auto" else bool(up)
        cfg.fused_edge_block = bool(self.config.use_pallas_edge)
        upl = self.config.use_pallas_layer
        # the whole-layer kernel's auto rule only arms when use_pallas is
        # "auto" too — pinning use_pallas True/False expresses an explicit
        # kernel choice the layer kernel must not silently override
        cfg.fused_layer = ("auto" if up == "auto" else False) \
            if upl == "auto" else bool(upl)
        cfg.attention_impl = str(self.config.attention_impl)
        cfg.attn_chain_f32 = bool(self.config.attn_chain_f32)
        cfg.compute_dtype = self.config.compute_dtype
        # False | True | "dots" (selective: matmul outputs stay resident,
        # the elementwise per-pair chain is recomputed)
        rm = self.config.remat
        cfg.remat = rm if rm == "dots" else bool(rm)
        self.model_config = cfg
        self.model = EGTGraphModel(cfg)
        self.params = self.model.init(jax.random.PRNGKey(self.config.seed))

        ep = int(self.config.edge_partition)
        if ep > 1 and self.pad_len % ep:
            raise ValueError(f"pad length {self.pad_len} must divide by "
                             f"edge_partition={ep}")
        if ep > 1 and not self.config.distributed:
            n_dev = ep
        else:
            n_dev = self.config.num_devices if self.config.distributed else 1
        self.mesh = meshlib.make_mesh(n_dev, model_parallel=ep)
        self.edge_partition = ep
        self.params = meshlib.replicate_tree(self.params, self.mesh)

        self.optimizer = optim.make_optimizer(
            self.config.optimizer, self.config.initial_lr,
            self.config.gradient_clipval, params=self.params)
        self.opt_state = jax.jit(
            self.optimizer.init,
            out_shardings=meshlib.replicated(self.mesh))(self.params)
        if self.state["lr"] is None:
            self.state["lr"] = float(self.config.initial_lr)

        self.model_summary()
        self._build_steps()

    def model_summary(self):
        """Architecture summary written to summary.txt (the reference writes the
        Keras `model.summary()` there, `training_base.py:220-224`)."""
        path = Path(self.config.summary_path)
        path.parent.mkdir(parents=True, exist_ok=True)
        lines = [f"model: {self.config.model_name}",
                 f"total params: {_count_params(self.params):,}", ""]
        rows = []
        for kp, leaf in jax.tree_util.tree_flatten_with_path(self.params)[0]:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in kp)
            rows.append((name, tuple(np.shape(leaf))))
        width = max(len(n) for n, _ in rows) + 2
        for name, shape in rows:
            n = int(np.prod(shape)) if shape else 1
            lines.append(f"{name:<{width}}{str(shape):<20}{n:>10,}")
        lines += ["", "per-subtree totals:"]
        for top, sub in self.params.items():
            lines.append(f"  {top}: {_count_params(sub):,}")
        text = "\n".join(lines)
        with open(str(path) + ".txt", "w") as fp:
            fp.write(text + "\n")
        print(f"model: {self.config.model_name}  "
              f"params: {_count_params(self.params):,} "
              f"(full summary: {path}.txt)", flush=True)

    # ---------------------------------------------------------------- step builders

    def _forward(self, params, batch, rng, training: bool):
        if self.edge_partition > 1:
            from ..parallel.edge_partition import edge_partitioned_forward
            out = edge_partitioned_forward(
                self.model, params, batch, self.mesh,
                axis=meshlib.MODEL_AXIS, data_axis=meshlib.DATA_AXIS,
                training=training, rng=rng)
            return out, None
        return self.model.apply(params, batch, training=training, rng=rng)

    def _compute_loss(self, params, batch, rng, training: bool):
        # compute_dtype is handled inside the model (activations cast after
        # embedding, f32 islands for norms/softmax, f32 output).
        out, ctx = self._forward(params, batch, rng, training)
        mask = self.model.output_mask(batch)
        target = batch["target"]
        if jnp.issubdtype(target.dtype, jnp.integer):
            target = target.astype(jnp.int32)  # int8 wire dtype -> index dtype
        loss, metric_pairs = self.loss_and_metrics(
            out, target, mask, batch.get("sample_mask"))
        total = loss
        if ctx is not None:
            for v in ctx.losses.values():
                total = total + v
        if self.model_config.l2_reg > 0:
            l2 = sum(jnp.sum(jnp.square(x))
                     for path, x in jax.tree_util.tree_flatten_with_path(params)[0]
                     if getattr(path[-1], "key", None) in ("kernel", "table"))
            total = total + self.model_config.l2_reg * l2
        if ctx is not None:
            for name, v in ctx.metrics.items():
                metric_pairs[name] = (v, jnp.asarray(1.0))
        return total, (metric_pairs, ctx.stats_updates if ctx is not None else {})

    def _grads_over_microbatches(self, params, acc, stacked, rng):
        """Gradient accumulation inner loop: `stacked` carries a leading
        microbatch axis `a` (static at trace time — a == grad_accum_steps,
        except for the epoch-tail stack). Scans the microbatches, averaging
        gradients and accumulating metric (sum, count) pairs; BatchNorm
        running-stat updates merge sequentially per microbatch (running stats
        never feed the training-mode forward, so gradients are unaffected).
        Returns (params_with_merged_stats, mean_grads, acc)."""
        a = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(carry, inp):
            params, gacc, acc = carry
            mb, ai = inp
            r = jax.random.fold_in(rng, ai)
            (loss, (pairs, stats)), g = jax.value_and_grad(
                self._compute_loss, has_aux=True)(params, mb, r, True)
            pairs = {"loss": (loss, jnp.asarray(1.0)), **pairs}
            acc = jax.tree_util.tree_map(jnp.add, acc, pairs)
            params = _merge_stats_updates(params, stats)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
            return (params, gacc, acc), None

        (params, gacc, acc), _ = jax.lax.scan(
            body, (params, zero_g, acc),
            (stacked, jnp.arange(a, dtype=jnp.int32)))
        grads = jax.tree_util.tree_map(lambda g: g / a, gacc)
        return params, grads, acc

    def _build_steps(self):
        rep = meshlib.replicated(self.mesh)
        bsh = meshlib.batch_sharding(self.mesh)
        A = max(1, int(self.config.grad_accum_steps))
        # microbatch stacks ride in with the batch axis second: (A, b, ...)
        bsh_a = NamedSharding(self.mesh, P(None, meshlib.DATA_AXIS))

        # Per-step host<->device round-trips are expensive (catastrophically so
        # over a tunneled chip): the PRNG fold happens INSIDE the jitted step
        # (the step index rides in as a host scalar), and metric (sum, count)
        # pairs accumulate ON DEVICE in a donated buffer — one device_get per
        # epoch instead of per step.

        def train_step(params, opt_state, acc, batch, base_rng, step, lr):
            rng = jax.random.fold_in(base_rng, step)
            if A > 1:
                params, grads, acc = self._grads_over_microbatches(
                    params, acc, batch, rng)
            else:
                (loss, (pairs, stats)), grads = jax.value_and_grad(
                    self._compute_loss, has_aux=True)(params, batch, rng, True)
            opt_state = optim.set_learning_rate(opt_state, lr)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if A == 1:
                params = _merge_stats_updates(params, stats)
                pairs = {"loss": (loss, jnp.asarray(1.0)), **pairs}
                acc = jax.tree_util.tree_map(jnp.add, acc, pairs)
            return params, opt_state, acc

        def eval_step(params, acc, batch):
            loss, (pairs, _) = self._compute_loss(params, batch, None, False)
            pairs = {"loss": (loss, jnp.asarray(1.0)), **pairs}
            return jax.tree_util.tree_map(jnp.add, acc, pairs)

        self._train_step = jax.jit(
            train_step,
            in_shardings=(rep, rep, rep, bsh_a if A > 1 else bsh, rep,
                          None, None),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1, 2),
        )
        self._eval_step = jax.jit(
            eval_step, in_shardings=(rep, rep, bsh), out_shardings=rep,
            donate_argnums=(1,))

        if int(self.config.steps_per_dispatch) > 1:
            bsh_k_eval = NamedSharding(self.mesh, P(None, meshlib.DATA_AXIS))

            def multi_eval_step(params, acc, batches):
                def body(acc, batch):
                    loss, (pairs, _) = self._compute_loss(params, batch, None,
                                                          False)
                    pairs = {"loss": (loss, jnp.asarray(1.0)), **pairs}
                    return jax.tree_util.tree_map(jnp.add, acc, pairs), None

                acc, _ = jax.lax.scan(body, acc, batches)
                return acc

            self._multi_eval_step = jax.jit(
                multi_eval_step, in_shardings=(rep, rep, bsh_k_eval),
                out_shardings=rep, donate_argnums=(1,))

        def predict_step(params, batch):
            out, _ = self._forward(params, batch, None, False)
            return out

        self._predict_step = jax.jit(
            predict_step, in_shardings=(rep, bsh), out_shardings=rep)

        # K steps per dispatch: one host->device transfer and one RPC per K
        # steps (lax.scan) — amortizes dispatch/transfer latency, which
        # dominates when the chip sits behind a network tunnel.
        K = int(self.config.steps_per_dispatch)
        if K > 1:
            bsh_k = NamedSharding(
                self.mesh,
                P(None, None, meshlib.DATA_AXIS) if A > 1
                else P(None, meshlib.DATA_AXIS))

            def multi_step(params, opt_state, acc, batches, base_rng, step0,
                           lrs):
                def body(carry, inp):
                    params, opt_state, acc = carry
                    batch, ki, lr = inp
                    rng = jax.random.fold_in(base_rng, step0 + ki)
                    if A > 1:
                        params, grads, acc = self._grads_over_microbatches(
                            params, acc, batch, rng)
                    else:
                        (loss, (pairs, stats)), grads = jax.value_and_grad(
                            self._compute_loss, has_aux=True)(
                                params, batch, rng, True)
                    opt_state = optim.set_learning_rate(opt_state, lr)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    if A == 1:
                        params = _merge_stats_updates(params, stats)
                        pairs = {"loss": (loss, jnp.asarray(1.0)), **pairs}
                        acc = jax.tree_util.tree_map(jnp.add, acc, pairs)
                    return (params, opt_state, acc), None

                ks = jnp.arange(K, dtype=jnp.int32)
                (params, opt_state, acc), _ = jax.lax.scan(
                    body, (params, opt_state, acc), (batches, ks, lrs))
                return params, opt_state, acc

            self._multi_step = jax.jit(
                multi_step,
                in_shardings=(rep, rep, rep, bsh_k, rep, None, None),
                out_shardings=(rep, rep, rep),
                donate_argnums=(0, 1, 2),
            )

    def _zero_metric_acc(self, batch, training: bool):
        """Zero-initialized on-device (sum, count) accumulator with the metric
        structure of this scheme (discovered via eval_shape — no execution).
        Host zeros are cached so each epoch costs ONE device_put."""
        key = bool(training)
        cache = getattr(self, "_zero_acc_cache", None)
        if cache is None:
            cache = self._zero_acc_cache = {}
        if key not in cache:
            def probe(params, b):
                rng = jax.random.PRNGKey(0) if training else None
                loss, (pairs, _) = self._compute_loss(params, b, rng, training)
                return {"loss": (loss, jnp.asarray(1.0)), **pairs}

            shapes = jax.eval_shape(probe, self.params, batch)
            cache[key] = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes)
        return meshlib.replicate_tree(cache[key], self.mesh)

    # -------------------------------------------------------------------- training

    def config_summary(self):
        for k, v in self.config.resolved().items():
            print(f"{k} : {v}", flush=True)

    def save_config_file(self):
        os.makedirs(self.config.config_path, exist_ok=True)
        save_config_to_file(self.config.resolved(),
                            join_path(self.config.config_path, "config.json"))
        save_config_to_file(self.config_input or {},
                            join_path(self.config.config_path,
                                      "config_input.json"))

    def load_state(self):
        self.checkpointer = ckpt.TrainCheckpointer(self.config.checkpoint_path)
        restored = self.checkpointer.restore(self.params, self.opt_state)
        if restored is not None:
            self.params, self.opt_state, train_state = restored
            self.params = meshlib.replicate_tree(self.params, self.mesh)
            self.opt_state = meshlib.replicate_tree(self.opt_state, self.mesh)
            self.state.update(train_state)
            print(f"Checkpoint loaded from {self.config.checkpoint_path} "
                  f"(epoch {self.state['current_epoch']})", flush=True)

    def _make_loggers(self):
        os.makedirs(self.config.log_path, exist_ok=True)
        self._jsonl = open(
            join_path(self.config.log_path, "metrics.jsonl"), "a")
        self._tb = None
        if self.config.log_tensorboard:
            try:
                # dependency-free scalar event writer (utils/tbevents.py) —
                # no torch/TF needed for a TensorBoard-readable log
                from ..utils.tbevents import EventWriter
                self._tb = EventWriter(self.config.log_path)
            except Exception as e:
                print(f"TensorBoard writer unavailable ({e}); using JSONL only",
                      flush=True)

    def _log_epoch(self, epoch: int, logs: dict):
        rec = {"epoch": epoch, "time": time.time(), **logs}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in logs.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, epoch)
            self._tb.flush()

    def train_model(self):
        cfg = self.config
        state = self.state
        self._make_loggers()
        save_when = ckpt.SaveWhen(os.path.dirname(cfg.saved_model_path),
                                  cfg.save_when)
        plateau_cfg = schedules.PlateauConfig(
            monitor=cfg.save_best_monitor,
            rlr_factor=cfg.rlr_factor,
            rlr_patience=cfg.rlr_patience,
            min_lr=cfg.initial_lr * cfg.min_lr_factor,
            stopping_lr=cfg.stopping_lr,
            save_best=cfg.save_best,
        )
        warmup_steps = getattr(cfg, "warmup_steps", 0) or 0
        total_steps = getattr(cfg, "total_steps", None)
        early_stop_patience = cfg.stopping_patience
        early_stop_best, early_stop_count = float("inf"), 0

        base_rng = jax.device_put(jax.random.PRNGKey(cfg.seed + 1),
                                  meshlib.replicated(self.mesh))
        K = max(1, int(cfg.steps_per_dispatch))
        if cfg.profile_dir:
            K = 1  # keep the step-granular trace window meaningful
        A = max(1, int(cfg.grad_accum_steps))
        bsh_k = NamedSharding(
            self.mesh, P(None, None, meshlib.DATA_AXIS) if A > 1
            else P(None, meshlib.DATA_AXIS))
        bsh_a = NamedSharding(self.mesh, P(None, meshlib.DATA_AXIS))

        def feed(epoch):
            src = self._batches("training", shuffle=True, epoch=epoch)
            if cfg.steps_per_epoch:
                import itertools
                # steps_per_epoch counts OPTIMIZER steps; each consumes A
                # microbatches
                src = itertools.islice(src, cfg.steps_per_epoch * A)
            return self._group_batches(src, K, bsh_k, A=A, bsh_a=bsh_a)

        stop = False
        epoch = state["current_epoch"]
        dev_acc = None
        log_interval = float(getattr(cfg, "log_interval", 60) or 0)
        while epoch < cfg.num_epochs and not stop:
            t0 = time.time()
            last_log = t0
            acc = M.MetricAccumulator()
            n_steps = 0
            for kind, dbatch in Prefetcher(feed(epoch)):
                step = state["global_step"]
                if dev_acc is None:
                    probe = dbatch if kind == "single" else \
                        jax.tree_util.tree_map(lambda x: x[0], dbatch)
                    if A > 1:  # strip the microbatch axis too
                        probe = jax.tree_util.tree_map(lambda x: x[0], probe)
                    dev_acc = self._zero_metric_acc(probe, training=True)
                if cfg.profile_dir:
                    if step == 10:
                        jax.profiler.start_trace(cfg.profile_dir)
                    elif step == 16:
                        jax.profiler.stop_trace()
                        print(f"device trace written to {cfg.profile_dir}",
                              flush=True)
                k_here = 1 if kind == "single" else K
                lrs = []
                for ki in range(k_here):
                    if warmup_steps > 0:
                        lr, stop_sched = schedules.warmup_cosine_lr(
                            step + ki, warmup_steps=warmup_steps,
                            max_lr=cfg.initial_lr, total_steps=total_steps)
                        if lr is not None:
                            state["lr"] = lr
                        if stop_sched:
                            stop = True
                            break
                    lrs.append(state["lr"])
                if len(lrs) < k_here:  # schedule ended mid-group
                    break
                if kind == "single":
                    self.params, self.opt_state, dev_acc = self._train_step(
                        self.params, self.opt_state, dev_acc, dbatch, base_rng,
                        np.int32(step), np.float32(lrs[0]))
                else:
                    self.params, self.opt_state, dev_acc = self._multi_step(
                        self.params, self.opt_state, dev_acc, dbatch, base_rng,
                        np.int32(step), np.asarray(lrs, np.float32))
                state["global_step"] = step + k_here
                n_steps += k_here
                now = time.time()
                if log_interval and now - last_log >= log_interval:
                    rate = n_steps * A * cfg.batch_size / (now - t0)
                    print(f"  epoch {epoch + 1}: step {n_steps} "
                          f"({rate:.0f} graphs/s)", flush=True)
                    last_log = now
            if dev_acc is not None:
                acc.update(jax.device_get(dev_acc))
                dev_acc = None  # re-zeroed from the host cache next epoch
            train_logs = acc.result()

            if cfg.reload_on_nan and not np.isfinite(train_logs.get("loss", 0.0)):
                print("Invalid loss, reloading checkpoint!!!", flush=True)
                self.load_state()
                continue

            val_logs = {}
            if "validation" in self.splits:
                val_logs = {f"val_{k}": v for k, v in
                            self.evaluate_split("validation",
                                                max_steps=cfg.validation_steps
                                                ).items()}
            logs = {**train_logs, **val_logs, "lr": state["lr"]}
            dt = time.time() - t0
            msg = " - ".join(f"{k}: {v:.5f}" for k, v in logs.items())
            print(f"Epoch {epoch + 1}/{cfg.num_epochs} [{dt:.1f}s, "
                  f"{n_steps} steps] {msg}", flush=True)

            # 1) save-when snapshots (evaluated against the PRE-update best value,
            #    matching the reference callback ordering)
            scope = {**logs, "epoch": epoch + 1,
                     **{k: v for k, v in state.items()
                        if isinstance(v, (int, float))}}
            save_when.maybe_save("epoch", scope, self.params)

            # 2) plateau / save-best / stop bookkeeping
            state["current_epoch"] = epoch + 1
            if cfg.save_best:
                new_lr, _, stop_pl = schedules.plateau_update(
                    state, plateau_cfg, state["lr"], epoch + 1, logs)
                state["lr"] = new_lr
                stop = stop or stop_pl

            # 3) early stopping on val_loss (`training_base.py:276-280`)
            if early_stop_patience > 0:
                v = logs.get("val_loss", float("inf"))
                if v < early_stop_best:
                    early_stop_best, early_stop_count = v, 0
                else:
                    early_stop_count += 1
                    if early_stop_count >= early_stop_patience:
                        print("Early stopping!", flush=True)
                        stop = True

            # 4) checkpoint every epoch
            self.checkpointer.save(epoch + 1, jax.device_get(self.params),
                                   jax.device_get(self.opt_state), dict(state))
            print(f"CHECKPOINT Epoch: {epoch + 1}", flush=True)

            self._log_epoch(epoch + 1, logs)
            epoch += 1

        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    # ------------------------------------------------------------------ evaluation

    def evaluate_split(self, split: str, max_steps=None) -> dict:
        acc = M.MetricAccumulator()
        K = max(1, int(self.config.steps_per_dispatch))
        bsh_k = NamedSharding(self.mesh, P(None, meshlib.DATA_AXIS))

        def feed():
            src = self._batches(split, shuffle=False)
            if max_steps:
                import itertools
                src = itertools.islice(src, max_steps)
            return self._group_batches(src, K, bsh_k)

        dev_acc = None
        for kind, dbatch in Prefetcher(feed()):
            if dev_acc is None:
                probe = dbatch if kind == "single" else \
                    jax.tree_util.tree_map(lambda x: x[0], dbatch)
                dev_acc = self._zero_metric_acc(probe, training=False)
            if kind == "single":
                dev_acc = self._eval_step(self.params, dev_acc, dbatch)
            else:
                dev_acc = self._multi_eval_step(self.params, dev_acc, dbatch)
        if dev_acc is not None:
            acc.update(jax.device_get(dev_acc))
        return acc.result()

    def predict_split(self, split: str):
        """Yield (host_batch, predictions) over a split, for custom eval loops."""
        for batch in self._batches(split, shuffle=False):
            dbatch = meshlib.put_global_batch(batch, self.mesh)
            out = jax.device_get(self._predict_step(self.params, dbatch))
            yield batch, out

    # ----------------------------------------------------------- top-level commands

    def execute_training(self):
        self.config_summary()
        self.save_config_file()
        self.load_data()
        self.load_model()
        self.load_state()
        self.train_model()
        self.finalize_training(skip_init=True)

    def save_model(self):
        path = self.config.saved_model_path + ".npz"
        ckpt.save_weights(jax.device_get(self.params), path)
        print(f"Saved model to {path}", flush=True)

    def finalize_training(self, skip_init: bool = False):
        if not skip_init:
            self.config_summary()
            self.load_data()
            self.load_model()
            self.load_state()
        self.save_model()
        print("DONE!!!", flush=True)

    def prepare_for_test(self):
        self.config_summary()
        self.load_data(splits=("training", "validation", "test"))
        self.load_model()

        wf = self.config.weight_file
        if wf == ":":
            wf = ckpt.latest_epoch_snapshot(
                os.path.dirname(self.config.saved_model_path))
        if wf == "":
            wf = self.config.saved_model_path + ".npz"
        if wf == "-":
            self.load_state()
            print("LOADED TRAINING STATE FOR PREDICTIONS!", flush=True)
        else:
            loaded = ckpt.load_weights(jax.device_get(self.params), wf)
            self.params = meshlib.replicate_tree(loaded, self.mesh)
            print(f'LOADED WEIGHT FILE "{wf}" FOR PREDICTIONS!', flush=True)

    def make_predictions_on_split(self, split: str):
        """Default prediction dump: stacked model outputs (+ per-record ids) to
        predictions/<split>_predictions.npz (`TrainingBase.make_predictions`
        analog, `training_base.py:366-377`). Schemes may override."""
        outs, masks = [], []
        for batch, out in self.predict_split(split):
            keep = batch["sample_mask"] > 0
            outs.append(np.asarray(out)[keep])
        name = {"training": "trainset", "validation": "valset",
                "test": "testset"}.get(split, split)
        path = join_path(self.config.predictions_path,
                         f"{name}_predictions.npz")
        np.savez(path, predictions=np.concatenate(outs, axis=0))
        print(f"saved predictions to {path}", flush=True)

    def make_predictions(self):
        self.pred_flag = True
        self.prepare_for_test()
        os.makedirs(self.config.predictions_path, exist_ok=True)
        for split in ("training", "validation", "test"):
            print("=" * 40, flush=True)
            print(f"Prediction on {split}.", flush=True)
            self.make_predictions_on_split(split)
            print(flush=True)

    def do_analysis(self, split: str = "test", max_batches: int = 1) -> str:
        """Dump per-layer attention logits / matrices / gates for a split —
        the CLI face of the reference's "analysis model"
        (`lib/models/analysis.py` + `get_analysis_model`,
        `graph_xformer_model_base.py:492-506`). Writes
        predictions/<split>_analysis.npz with keys like 'mha_00/mat'."""
        self.pred_flag = True
        self.prepare_for_test()
        os.makedirs(self.config.predictions_path, exist_ok=True)
        dumps: dict[str, list] = {}
        # jit once: analyze() is a pure re-run of the forward with capture
        # enabled, and un-jitted tracing per batch is pathological for
        # --max-batches > 1
        analyze_jit = jax.jit(functools.partial(self.model.analyze))
        for i, batch in enumerate(self._batches(split, shuffle=False)):
            if i >= max_batches:
                break
            analysis = analyze_jit(self.params, batch)
            for k, v in analysis.items():
                if isinstance(v, (list, tuple)):
                    continue  # combine_layer_repr lists: not batchable here
                dumps.setdefault(k, []).append(np.asarray(v))
        name = {"training": "trainset", "validation": "valset",
                "test": "testset"}.get(split, split)
        path = join_path(self.config.predictions_path, f"{name}_analysis.npz")
        np.savez(path, **{k.replace("/", "."): np.concatenate(v)
                          for k, v in dumps.items()})
        print(f"saved analysis tensors to {path}", flush=True)
        return path

    def export_serving(self, path: str | None = None) -> str:
        """Export an AOT-compiled, weight-embedded inference artifact
        (see egt_tpu/serving.py). Loads weights per `weight_file` semantics."""
        from .. import serving

        self.pred_flag = True
        self.prepare_for_test()
        if path is None:
            path = join_path(self.config.save_path, "serving", "model.bin")
        spec = serving.batch_spec(
            self.dataset, self.pad_len,
            self.config.batch_size * self.config.prediction_bmult)
        out = serving.save_serving(self.model, self.params, spec, path)
        print(f"Serving artifact exported to {out}", flush=True)
        return out

    def do_evaluations_on_split(self, split: str):
        raise NotImplementedError

    def do_evaluations(self):
        self.eval_flag = True
        self.prepare_for_test()
        os.makedirs(self.config.predictions_path, exist_ok=True)
        for split in ("training", "validation", "test"):
            print("=" * 40, flush=True)
            print(f"Evaluation on {split}.", flush=True)
            self.do_evaluations_on_split(split)
            print(flush=True)

    def append_eval(self, split: str, lines: list[str]):
        os.makedirs(self.config.predictions_path, exist_ok=True)
        name = {"training": "trainset", "validation": "valset",
                "test": "testset"}.get(split, split)
        path = join_path(self.config.predictions_path, f"{name}_evals.txt")
        with open(path, "a") as fp:
            for ln in lines:
                print(ln, file=fp)
        for ln in lines:
            print(ln, flush=True)
