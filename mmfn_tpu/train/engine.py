"""Training engine.

Mirrors the reference Engine (run_steps/phase2_train_net.py:35-220): AdamW
(lr 1e-4, weight decay on all params — torch default), mean-L1 loss over the 4
predicted waypoints, periodic validation, best-model tracking, and a
``recent.log`` JSON with epoch/iter/bestval/loss histories for resume.

TPU-native differences:
- one jitted, buffer-donating train step (forward+backward+update fused by XLA)
  instead of eager per-op dispatch;
- data parallelism via GSPMD mesh sharding (see mmfn_tpu.parallel) instead of
  DDP/NCCL — the same step function runs single-chip or across a pod slice;
- checkpoints are flax msgpack pytrees + the same recent.log JSON contract.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax import serialization

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_optimizer(config: GlobalConfig) -> optax.GradientTransformation:
    # torch.optim.AdamW defaults: betas (0.9, 0.999), eps 1e-8, wd 0.01 on all
    # params (the reference does not use the GPT decay/no-decay split —
    # configure_optimizers is dead code, phase2_train_net.py:256).
    return optax.adamw(config.lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=config.weight_decay)


def create_train_state(model, config: GlobalConfig, rng, sample_batch: Batch,
                       tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    # jit the init: flax's Module.init runs the forward eagerly op-by-op,
    # which costs minutes of per-primitive dispatch on CPU for the full
    # graph; one traced compile is ~10x faster and persistently cacheable
    args = _model_args(model, sample_batch, True)
    variables = jax.jit(model.init, static_argnums=(len(args),))(
        {"params": rng, "dropout": jax.random.PRNGKey(0)}, *args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx or create_optimizer(config)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def fast_init_train_state(model, config: GlobalConfig, rng,
                          sample_batch: Batch,
                          tx: Optional[optax.GradientTransformation] = None
                          ) -> TrainState:
    """A TrainState with the exact structure/shapes/dtypes of
    :func:`create_train_state` but WITHOUT compiling the model's forward:
    the param tree comes from ``jax.eval_shape`` (pure tracing, no XLA) and
    the leaves are filled host-side by name. For smoke/dryrun paths where a
    full init compile costs minutes (the 8-virtual-device CPU dryrun spends
    ~110 s in the two jitted inits alone) and the VALUES only need to drive
    one finite training step, not train well.

    Fill rules cover every leaf name the model zoo produces (verified by
    test_fast_init_matches_real_init_structure): zeros for biases and BN
    means, ones for norm scales and BN vars (so normalizing layers stay
    finite), N(0, 0.02) for everything else (kernels, GAT W/a, LSTM weights,
    positional embeddings).
    """
    args = _model_args(model, sample_batch, True)
    shapes = jax.eval_shape(
        lambda r, *a: model.init(r, *a, True),
        {"params": rng, "dropout": jax.random.PRNGKey(0)}, *args[:-1])
    host = np.random.default_rng(int(np.asarray(jax.random.bits(rng))))

    def fill(path, leaf):
        name = path[-1].key
        if name in ("bias", "bias_ih", "bias_hh", "mean"):
            arr = np.zeros(leaf.shape, leaf.dtype)
        elif name in ("scale", "var"):
            arr = np.ones(leaf.shape, leaf.dtype)
        else:
            arr = host.normal(0.0, 0.02, leaf.shape).astype(leaf.dtype)
        return jnp.asarray(arr)

    variables = jax.tree_util.tree_map_with_path(fill, shapes)
    params = variables["params"]
    tx = tx or create_optimizer(config)
    return TrainState(params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def waypoint_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 over all waypoint coordinates (phase2_train_net.py:104)."""
    return jnp.abs(pred - target).mean()


def cilrs_loss(out, batch: Batch) -> jnp.ndarray:
    """CILRS composite loss (benchmarks/cilrs/train.py:93-96):
    0.05·L1(velocity) + L1(steer) + L1(throttle) + L1(brake)."""
    steer, throttle, brake, velocity_pred = out
    action = batch.action.astype(jnp.float32)
    return (0.05 * jnp.abs(velocity_pred.squeeze(-1).astype(jnp.float32)
                           - batch.velocity).mean()
            + jnp.abs(steer.astype(jnp.float32) - action[:, 0]).mean()
            + jnp.abs(throttle.astype(jnp.float32) - action[:, 1]).mean()
            + jnp.abs(brake.astype(jnp.float32) - action[:, 2]).mean())


def _is_cilrs(model) -> bool:
    return getattr(model, "variant", "") == "cilrs"


def _model_args(model, batch: Batch, train: bool):
    """CILRS takes the navigational command as an explicit argument
    (benchmarks/cilrs/model.py forward); every other model is (batch, train)."""
    if _is_cilrs(model):
        return (batch, jnp.asarray(batch.command, jnp.int32), train)
    return (batch, train)


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def make_train_step(model, tx: optax.GradientTransformation,
                    compute_dtype=jnp.float32) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, loss), buffers donated.

    compute_dtype=bfloat16 runs the forward/backward in bf16 activations
    with f32 master params and an f32 optimizer (measured 1.16x per step on
    one v5e chip, 64.2 -> 55.5 ms at batch 24 full MMFN-rad; the loss is
    always reduced in f32). Opt-in via GlobalConfig.compute_dtype — the
    reference trains pure f32, so parity checkpoints keep the default.

    Activation rematerialization is a MODEL property, not a step property:
    GlobalConfig.remat=True makes the ResNet backbones checkpoint per block
    (models/resnet.py) so the backward recomputes conv activations instead
    of keeping them resident — whole-graph jax.checkpoint here would NOT
    reduce peak HBM (a single segment's backward still materializes the
    full forward it recomputes).
    """
    half = jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32)

    def train_step(state: TrainState, batch: Batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            p = _cast_floats(params, compute_dtype) if half else params
            b = _cast_floats(batch, compute_dtype) if half else batch
            # batch_stats deliberately stay f32: the BN running-average EMA
            # accumulates into them every step, and bf16's ~8-bit mantissa
            # would quantize the stats eval depends on (batch statistics used
            # in the forward still come from the bf16 activations)
            out, mutated = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                *_model_args(model, b, True),
                rngs={"dropout": rng}, mutable=["batch_stats"])
            if _is_cilrs(model):
                loss = cilrs_loss(out, batch)
            else:
                loss = waypoint_l1_loss(out.astype(jnp.float32), batch.waypoints)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if half:
            grads = _cast_floats(grads, jnp.float32)
            new_stats = _cast_floats(new_stats, jnp.float32)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    def eval_step(state: TrainState, batch: Batch):
        out = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                          *_model_args(model, batch, False))
        if _is_cilrs(model):
            return cilrs_loss(out, batch)
        return waypoint_l1_loss(out, batch.waypoints)

    return jax.jit(eval_step)


class Engine:
    """Epoch-loop driver with best-model tracking and resume.

    File contract (mirrors reference Engine.save, phase2_train_net.py:184-220):
      logdir/recent.log        JSON: epoch/iter/bestval/bestval_epoch/losses
      logdir/model.msgpack     most recent TrainState
      logdir/best_model.msgpack  best-validation TrainState
    """

    def __init__(self, model, config: GlobalConfig, logdir: str,
                 tx: Optional[optax.GradientTransformation] = None,
                 log_fn: Callable[[dict], None] = None):
        self.model = model
        self.config = config
        self.logdir = logdir
        self.tx = tx or create_optimizer(config)
        self.train_step = make_train_step(
            model, self.tx,
            compute_dtype=jnp.dtype(getattr(config, "compute_dtype", "float32")))
        self.eval_step = make_eval_step(model)
        self.cur_epoch = 0
        self.cur_iter = 0
        self.bestval = 1e10
        self.bestval_epoch = 0
        self.train_loss = []
        self.val_loss = []
        self.log_fn = log_fn or (lambda d: None)
        # "msgpack" mirrors the reference's file contract (rank-0 full-state
        # write). "orbax" is the TPU-native production path: every host
        # writes only its own array shards (no full gather into host RAM)
        # and saves are ASYNC — training continues while the previous
        # checkpoint flushes; call finalize() (fit() does) before exit.
        self.checkpoint_backend = getattr(config, "checkpoint_backend",
                                          "msgpack")
        self._orbax = None
        os.makedirs(logdir, exist_ok=True)

    def _orbax_ckptr(self):
        if self._orbax is None:
            import orbax.checkpoint as ocp

            self._orbax = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return self._orbax

    def finalize(self) -> None:
        """Block until any in-flight async checkpoint write has committed."""
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    # ---- epoch phases -------------------------------------------------- #

    def train(self, state: TrainState, batches: Iterable[Batch], rng,
              log_every: int = 0) -> TrainState:
        """log_every > 0 emits per-iteration loss (reference wandb per-iter
        logging, phase2_train_net.py:113-115) — fetching the loss synchronizes
        with the device, so 0 (epoch-level only) is the fast default."""
        losses = []
        for batch in batches:
            state, loss = self.train_step(state, batch, rng)
            losses.append(loss)
            self.cur_iter += 1
            if log_every and self.cur_iter % log_every == 0:
                loss_host = float(loss)
                if not math.isfinite(loss_host):
                    raise FloatingPointError(
                        f"non-finite training loss at iter {self.cur_iter} "
                        f"(epoch {self.cur_epoch + 1}); rerun with "
                        f"JAX_DEBUG_NANS=1 to localize the op")
                self.log_fn({"loss_iter": loss_host, "iter": self.cur_iter})
        epoch_loss = float(jnp.stack(losses).mean()) if losses else float("nan")
        # the analog of the reference's set_detect_anomaly(True)
        # (phase2_train_net.py:107): a poisoned epoch aborts loudly instead
        # of silently writing NaN checkpoints; checked once per epoch so the
        # fast path stays free of device syncs
        if losses and not math.isfinite(epoch_loss):
            raise FloatingPointError(
                f"non-finite mean training loss in epoch {self.cur_epoch + 1};"
                f" rerun with JAX_DEBUG_NANS=1 to localize the op")
        self.train_loss.append(epoch_loss)
        self.cur_epoch += 1
        self.log_fn({"loss": epoch_loss, "epoch": self.cur_epoch})
        return state

    def validate(self, state: TrainState, batches: Iterable[Batch]) -> float:
        losses = [self.eval_step(state, b) for b in batches]
        val = float(jnp.stack(losses).mean()) if losses else float("nan")
        self.val_loss.append(val)
        self.log_fn({"val_loss": val, "epoch": self.cur_epoch})
        return val

    # ---- checkpointing -------------------------------------------------- #

    def _log_table(self) -> dict:
        return {
            "epoch": self.cur_epoch,
            "iter": self.cur_iter,
            "bestval": self.bestval,
            "bestval_epoch": self.bestval_epoch,
            "train_loss": self.train_loss,
            "val_loss": self.val_loss,
        }

    def save(self, state: TrainState) -> bool:
        if self.checkpoint_backend == "orbax":
            return self._save_orbax(state)
        if jax.process_index() != 0:
            # rank-0-only checkpointing, matching the reference's DDP gating
            # (phase2_train_net.py:319-322)
            return False
        save_best = bool(self.val_loss) and self.val_loss[-1] <= self.bestval
        # serialize ONCE: to_bytes fetches every leaf from the device and
        # msgpacks ~12 B/param — doing it per output file doubled the save
        # stall (measured ~2x on the relay link, round 4)
        blob = serialization.to_bytes(state)
        if save_best:
            self.bestval = self.val_loss[-1]
            self.bestval_epoch = self.cur_epoch
            with open(os.path.join(self.logdir, "best_model.msgpack"), "wb") as f:
                f.write(blob)
        with open(os.path.join(self.logdir, "model.msgpack"), "wb") as f:
            f.write(blob)
        with open(os.path.join(self.logdir, "recent.log"), "w") as f:
            json.dump(self._log_table(), f)
        return save_best

    def _save_orbax(self, state: TrainState) -> bool:
        """Multi-host-safe sharded checkpointing: called on EVERY process
        (orbax coordinates the write; each host persists only its own array
        shards — no rank-0 full-state gather). Directory contract mirrors
        the msgpack names: logdir/model.orbax and logdir/best_model.orbax.

        recent.log is written only AFTER the checkpoint directories commit:
        metadata must never describe a newer state than the arrays on disk,
        or a crash mid-flush would make resume() restore old weights under
        new bookkeeping (epoch counter ahead of the actual params). The
        AsyncCheckpointer still overlaps the device->host copy with the disk
        flush inside each save."""
        import orbax.checkpoint as ocp

        # val loss is a global-batch value under GSPMD, so every process
        # takes the same save_best branch
        save_best = bool(self.val_loss) and self.val_loss[-1] <= self.bestval
        if save_best:
            self.bestval = self.val_loss[-1]
            self.bestval_epoch = self.cur_epoch
        ckptr = self._orbax_ckptr()
        ckptr.wait_until_finished()       # one in-flight write at a time
        ckptr.save(os.path.abspath(os.path.join(self.logdir, "model.orbax")),
                   args=ocp.args.StandardSave(state), force=True)
        if save_best:
            ckptr.wait_until_finished()
            ckptr.save(
                os.path.abspath(os.path.join(self.logdir, "best_model.orbax")),
                args=ocp.args.StandardSave(state), force=True)
        ckptr.wait_until_finished()       # commit before publishing metadata
        if jax.process_index() == 0:
            with open(os.path.join(self.logdir, "recent.log"), "w") as f:
                json.dump(self._log_table(), f)
        return save_best

    def resume(self, state_template: TrainState, best: bool = False) -> Optional[TrainState]:
        """Restore state and loss history if a checkpoint exists; else None."""
        orbax = self.checkpoint_backend == "orbax"
        ext = "orbax" if orbax else "msgpack"
        log_path = os.path.join(self.logdir, "recent.log")
        name = f"best_model.{ext}" if best else f"model.{ext}"
        ckpt_path = os.path.join(self.logdir, name)
        if not (os.path.exists(log_path) and os.path.exists(ckpt_path)):
            return None
        with open(log_path) as f:
            table = json.load(f)
        self.cur_epoch = table["epoch"]
        self.cur_iter = table.get("iter", 0)
        self.bestval = table["bestval"]
        self.bestval_epoch = table.get("bestval_epoch", 0)
        self.train_loss = table["train_loss"]
        self.val_loss = table["val_loss"]
        if orbax:
            import orbax.checkpoint as ocp

            # restores each array with the TEMPLATE's sharding — every host
            # reads only the shards it owns
            return self._orbax_ckptr().restore(
                os.path.abspath(ckpt_path),
                args=ocp.args.StandardRestore(state_template))
        with open(ckpt_path, "rb") as f:
            return serialization.from_bytes(state_template, f.read())

    # ---- full loop ------------------------------------------------------ #

    def fit(self, state: TrainState, train_batches_fn, val_batches_fn,
            epochs: int, rng, val_every: int = 5, save_every: int = 20):
        """train_batches_fn/val_batches_fn: callables returning fresh iterables
        per epoch (mirrors DataLoader re-iteration)."""
        try:
            for epoch in range(self.cur_epoch, epochs):
                t0 = time.time()
                state = self.train(state, train_batches_fn(epoch), rng)
                self.log_fn({"epoch_minutes": (time.time() - t0) / 60,
                             "epoch": epoch})
                if epoch % val_every == 0:
                    self.validate(state, val_batches_fn(epoch))
                    if epoch % save_every == 0:
                        self.save(state)
        finally:
            # even when an epoch raises (non-finite-loss abort), any
            # in-flight async checkpoint write must commit before unwind
            self.finalize()
        return state
