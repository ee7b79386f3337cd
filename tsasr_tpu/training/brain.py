"""The Brain: fit/evaluate training template over jitted SPMD steps.

Functional equivalent of the reference trainer
(``vendor/speechbrain/speechbrain/core.py:422-1643``), redesigned for
JAX/TPU:

- the reference's per-batch Python autograd loop becomes ONE jitted
  ``train_step`` (forward + loss + grad + clip + optimizer update +
  gradient accumulation via ``optax.MultiSteps``), compiled once per
  bucket shape; batches arrive bucket-quantized so the compile set stays
  small;
- DDP wrapping/no_sync (``core.py:1057,1464-1490``) disappears: the step
  is SPMD over a mesh, the gradient mean is an XLA psum over the 'data'
  axis, and accumulation skips nothing because the collective is part of
  the compiled program;
- fp16/bf16 autocast + GradScaler (``core.py:1058-1089``) becomes native
  bf16 compute dtype with f32 params/optimizer — no scaler needed on TPU;
- run-opts cascade (CLI > hparams > defaults, ``core.py:550-606``),
  nonfinite-loss patience (``core.py:1115-1150``), grad-norm tracking,
  debug mode (N batches/epochs), intra-epoch checkpointing by minutes or
  steps (``core.py:1241-1257``), ``--test_only``, progressbars, and the
  named-recoverable checkpoint discipline are all preserved.

Subclasses override ``compute_forward`` / ``compute_objectives`` (pure,
jit-traced) and the ``on_*`` hooks (host side), mirroring the reference
Brain API surface.
"""

import logging
import os
import time
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.data.loader import LoopedLoader, SaveableDataLoader
from tsasr_tpu.parallel.distributed import if_main_process
from tsasr_tpu.training.schedulers import noam_schedule
from tsasr_tpu.utils.stage import Stage

logger = logging.getLogger(__name__)

DEFAULT_RUN_OPTS = {
    "debug": False,
    "debug_batches": 2,
    "debug_epochs": 2,
    "device": None,
    "precision": "fp32",            # fp32 | bf16
    "noprogressbar": False,
    "grad_accumulation_factor": 1,
    "optimizer_step_limit": None,
    "ckpt_interval_minutes": 0,
    "ckpt_interval_steps": 0,
    "max_grad_norm": 5.0,
    "nonfinite_patience": 3,
    "test_only": False,
    "tqdm_colored_bar": False,
}


class Brain:
    """Training orchestrator. Construct with:

    modules : dict with at least ``model`` (a flax Module); exposed as
        ``self.modules.<name>``.
    opt_class : optimizer factory (see ``training.optimizers``) taking an
        optional learning_rate/schedule.
    hparams : plain dict -> attribute access via ``self.hparams``.
    run_opts : runtime flag dict (overrides hparams which override
        defaults, the reference cascade).
    checkpointer : ``Checkpointer`` or None; the Brain registers itself
        (params/opt state/step counters) as recoverable "brain".
    mesh : ``jax.sharding.Mesh`` or None (single device).
    """

    def __init__(self, modules=None, opt_class=None, hparams=None,
                 run_opts=None, checkpointer=None, mesh=None):
        self.opt_class = opt_class
        self.hparams = SimpleNamespace(**(hparams or {}))
        self.checkpointer = checkpointer
        self.mesh = mesh

        resolved = dict(DEFAULT_RUN_OPTS)
        for key in resolved:
            if hparams and key in hparams:
                resolved[key] = hparams[key]
        for key, value in (run_opts or {}).items():
            if value is not None:
                resolved[key] = value
        for key, value in resolved.items():
            setattr(self, key, value)

        self.modules = SimpleNamespace(**(modules or {}))
        self.model = getattr(self.modules, "model", None)

        seed = getattr(self.hparams, "seed", 0)
        # Dropout/augment PRNG: the default threefry generator costs
        # ~35 ms/step on the production config (measured: 12-layer
        # encoder fwd+bwd 73.3 ms threefry vs 39.6 ms rbg on v5e, vs
        # 38 ms without dropout) — the TPU-hardware RBG generator makes
        # mask generation effectively free. hparams `rng_impl` opts back
        # into threefry for bit-exact legacy reproducibility.
        impl = getattr(self.hparams, "rng_impl", "rbg")
        try:
            self.rng = jax.random.key(seed, impl=impl)
        except (TypeError, ValueError):
            self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.optimizer = None
        self.step = 0                     # batches this epoch
        self.global_micro_step = 0        # micro-batches, all epochs
        self.optimizer_step = 0           # global optimizer steps
        self.nonfinite_count = 0
        self.avg_train_loss = 0.0
        self.train_sampler = None
        self._jit_train_step = None
        self._jit_eval_step = None
        self._last_ckpt_time = time.time()

        if self.checkpointer is not None:
            self.checkpointer.add_recoverable("brain", _BrainState(self))
            # mirror the reference's recoverables block (scheduler+counter,
            # conformer-t_scratch.yaml:309-315)
            sched = getattr(self.hparams, "noam_scheduler", None)
            if sched is not None and hasattr(sched, "save"):
                self.checkpointer.add_recoverable("scheduler", sched)
            counter = getattr(self.hparams, "epoch_counter", None)
            if counter is not None and hasattr(counter, "save"):
                self.checkpointer.add_recoverable("counter", counter)

    # ================================================== subclass surface
    def compute_forward(self, params, batch, stage, rng):
        """Pure forward (jit-traced): batch dict -> predictions."""
        raise NotImplementedError

    def compute_objectives(self, predictions, batch, stage):
        """Pure loss (jit-traced): predictions + batch -> scalar loss."""
        raise NotImplementedError

    def batch_to_arrays(self, batch):
        """PaddedBatch -> dict of numpy arrays for the jitted step."""
        raise NotImplementedError

    def on_stage_start(self, stage, epoch=None):
        pass

    def on_stage_end(self, stage, stage_loss, epoch=None):
        pass

    def on_fit_start(self):
        pass

    def on_fit_batch_start(self, batch, should_step):
        pass

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        pass

    def on_evaluate_start(self, max_key=None, min_key=None):
        if self.checkpointer is not None:
            # keep the recovered checkpoint visible to subclasses: the
            # "Epoch loaded" log line must report the epoch whose params
            # are actually being evaluated (keep-best may pick an
            # earlier epoch than the fit loop's last)
            self._recovered_ckpt = self.checkpointer.recover_if_possible(
                min_key=min_key, max_key=max_key)

    def evaluate_batch_extra(self, batch, arrays, predictions, stage):
        """Host-side per-eval-batch hook (decoding, metrics)."""

    # ==================================================== initialization
    def make_example_batch(self):
        """Tiny dummy batch for parameter init; subclass provides."""
        raise NotImplementedError

    def _ensure_initialized(self):
        if self.params is not None:
            return
        example = self.make_example_batch()
        init_rng, self.rng = jax.random.split(self.rng)
        self.params = self._init_params(init_rng, example)
        if hasattr(self, "_restored"):
            from flax import serialization
            self.params = serialization.from_state_dict(
                self.params, self._restored["params"])
            del self._restored
        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        logger.info("%.1fM trainable parameters initialized",
                    n_params / 1e6)
        if self.mesh is not None:
            from tsasr_tpu.parallel.mesh import (
                param_shardings,
                validate_tp_shardings,
            )
            shardings = param_shardings(self.params, self.mesh)
            if self.mesh.shape.get("model", 1) > 1:
                # loud failure on flax name drift instead of silent
                # replication (see parallel/mesh.py:validate_tp_shardings)
                sharded, replicated = validate_tp_shardings(shardings)
                logger.info(
                    "TP sharding: %d leaves on 'model' axis, %d "
                    "replicated", len(sharded), len(replicated))
                logger.debug("TP-sharded leaves: %s", sharded)
            self.params = jax.tree.map(jax.device_put, self.params,
                                       shardings)

    def _init_params(self, rng, example_batch):
        raise NotImplementedError

    def init_optimizers(self):
        if self.opt_class is None:
            return
        schedule = self._lr_schedule()
        base = self.opt_class(learning_rate=schedule) if schedule \
            else self.opt_class()
        tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm), base)
        accum = int(self.grad_accumulation_factor)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        self.optimizer = tx
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)
            if hasattr(self, "_restored_opt_state"):
                # a checkpoint loaded before the optimizer existed —
                # restore Adam moments/MultiSteps counters onto the
                # freshly built state instead of dropping them
                from flax import serialization
                self.opt_state = serialization.from_state_dict(
                    self.opt_state, self._restored_opt_state)
                del self._restored_opt_state

    def _lr_schedule(self):
        """Noam (or any) schedule from hparams; None = constant lr."""
        sched = getattr(self.hparams, "noam_scheduler", None)
        enabled = getattr(self.hparams, "enable_scheduler", True)
        if sched is not None and enabled:
            return sched.as_schedule_fn()
        return None

    def current_lr(self):
        sched = self._lr_schedule()
        if sched is None:
            return getattr(self.opt_class, "base_lr", 0.0) \
                if self.opt_class else 0.0
        return float(sched(max(self.optimizer_step, 1)))

    # ======================================================= jitted steps
    def _build_train_step(self):
        # No loss/accum scaling here: optax.MultiSteps *averages*
        # micro-batch grads, which already matches the reference's
        # sum-of-(loss/k) DDP semantics — dividing again would shrink
        # effective grads k× and defeat clip_by_global_norm.
        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                predictions = self.compute_forward(p, batch, Stage.TRAIN,
                                                   rng)
                return self.compute_objectives(predictions, batch,
                                               Stage.TRAIN)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grad_norm = optax.global_norm(grads)
            finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

            # Skip the batch entirely on nonfinite loss/grads: neither
            # the MultiSteps micro-step nor the optimizer/schedule count
            # advances (reference check_gradients, core.py:1115-1150).
            def do_update(operand):
                p, s, g = operand
                updates, new_s = self.optimizer.update(g, s, p)
                return optax.apply_updates(p, updates), new_s

            new_params, new_opt_state = jax.lax.cond(
                finite, do_update, lambda o: (o[0], o[1]),
                (params, opt_state, grads))
            return new_params, new_opt_state, loss, grad_norm, finite

        return jax.jit(train_step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        def eval_step(params, batch, stage_name):
            stage = Stage.VALID if stage_name == 0 else Stage.TEST
            predictions = self.compute_forward(
                params, batch, stage, jax.random.PRNGKey(0))
            loss = self.compute_objectives(predictions, batch, stage)
            return loss, predictions

        return jax.jit(eval_step, static_argnums=(2,))

    def _put_batch(self, arrays, local=False):
        """Host batch -> device arrays.

        ``local=True`` (multi-process eval): keep the batch on this
        process's local default device instead of the global mesh —
        each process evaluates its own disjoint sampler shard
        (``recipes/librispeechmix.py::build_dataloader_kwargs``).
        """
        if self.mesh is not None and not local:
            from tsasr_tpu.parallel.mesh import shard_batch
            return shard_batch(arrays, self.mesh)
        return {k: jnp.asarray(v) for k, v in arrays.items()}

    def _local_eval(self):
        """Multi-process eval is process-local (disjoint shards +
        metric allgather); single-process eval may ride the mesh."""
        return self.mesh is not None and jax.process_count() > 1

    def _get_eval_params(self):
        """Params for the eval/decode path.

        Multi-process: global-mesh params cannot feed a process-local
        jit, so gather them to host once per params version (the gather
        is a COLLECTIVE for tp-sharded leaves — all processes enter
        eval in lockstep, same batch counts via the padded
        DistributedSamplerWrapper). Single-process: the live params.
        """
        if not self._local_eval():
            return self.params
        if getattr(self, "_eval_params_src", None) is not self.params:
            from tsasr_tpu.training.checkpoints import gather_to_host
            self._eval_params = jax.tree.map(
                jnp.asarray, gather_to_host(self.params))
            self._eval_params_src = self.params
        return self._eval_params

    # =========================================================== fitting
    def fit_batch(self, batch):
        """Dispatch one jitted step; the loss is read back one step
        *late* so the host never blocks on the device (JAX async
        dispatch keeps the step pipeline full; the reference blocks on
        ``loss.detach().cpu()`` every batch)."""
        arrays = self._put_batch(self.batch_to_arrays(batch))
        step_rng = jax.random.fold_in(self.rng, self.optimizer_step * 131071
                                      + self.step)
        self.params, self.opt_state, loss, grad_norm, finite = \
            self._jit_train_step(self.params, self.opt_state, arrays,
                                 step_rng)
        # the persistent micro counter mirrors MultiSteps' mini_step
        # (per-epoch self.step would drift when epochs aren't multiples
        # of the accumulation factor); nonfinite batches are un-counted
        # in _consume_loss, one async step later, matching the device's
        # skipped update.
        self.global_micro_step += 1
        self._sync_step_counters()
        pending, self._pending_loss = \
            getattr(self, "_pending_loss", None), (loss, grad_norm,
                                                   finite)
        if pending is None:
            return float("nan")      # first batch: no value yet
        return self._consume_loss(pending)

    def _sync_step_counters(self):
        new_opt_step = self.global_micro_step // int(
            self.grad_accumulation_factor)
        if new_opt_step != self.optimizer_step:
            self.optimizer_step = new_opt_step
            sched = getattr(self.hparams, "noam_scheduler", None)
            if sched is not None and \
                    getattr(self.hparams, "enable_scheduler", True):
                sched.n_steps = self.optimizer_step
                sched.current_lr = self.current_lr()

    def _consume_loss(self, pending):
        loss, grad_norm, finite = pending
        loss_val = float(loss)
        # branch on the DEVICE's skip decision (loss OR grad nonfinite),
        # not just the loss — a finite-loss/inf-grad batch is skipped on
        # device and must be un-counted here too
        if not bool(finite):
            self.nonfinite_count += 1
            logger.warning(
                "Nonfinite batch %d skipped (loss=%s grad_norm=%s, "
                "patience %d/%d)", self.step, loss_val,
                float(grad_norm), self.nonfinite_count,
                self.nonfinite_patience)
            if self.nonfinite_count > self.nonfinite_patience:
                raise ValueError(
                    "Loss is not finite and patience is exhausted")
            # the device skipped this micro-batch entirely — un-count it
            self.global_micro_step = max(0, self.global_micro_step - 1)
            self._sync_step_counters()
            loss_val = self.avg_train_loss
        self.last_grad_norm = float(grad_norm)
        return loss_val

    def _flush_pending_loss(self):
        pending, self._pending_loss = \
            getattr(self, "_pending_loss", None), None
        if pending is not None:
            return self._consume_loss(pending)
        return None

    def _update_average(self, loss, avg_loss):
        if np.isfinite(loss):
            avg_loss -= avg_loss / self.step
            avg_loss += loss / self.step
        return avg_loss

    def fit(self, epoch_counter, train_set, valid_set=None,
            progressbar=None, train_loader_kwargs=None,
            valid_loader_kwargs=None):
        if not isinstance(train_set, (SaveableDataLoader, LoopedLoader)):
            train_set = SaveableDataLoader(train_set,
                                           **(train_loader_kwargs or {}))
        if valid_set is not None and not isinstance(
                valid_set, (SaveableDataLoader, LoopedLoader)):
            valid_set = SaveableDataLoader(valid_set,
                                           **(valid_loader_kwargs or {}))
        self.train_loader = train_set

        self._ensure_initialized()
        self.on_fit_start()
        self.init_optimizers()
        if self._jit_train_step is None:
            self._jit_train_step = self._build_train_step()
        if self.debug and self.checkpointer is not None and \
                not getattr(self, "_debug_ckpt_diverted", False):
            # debug runs checkpoint into a throwaway dir (reference
            # core.py:670-685)
            import tempfile
            self.checkpointer.checkpoints_dir = tempfile.mkdtemp(
                prefix="tsasr_debug_ckpt_")
            self._debug_ckpt_diverted = True
        if self.checkpointer is not None:
            self.checkpointer.add_recoverable("dataloader", train_set)
            self.checkpointer.recover_if_possible()
        if progressbar is None:
            progressbar = not self.noprogressbar

        if self.test_only:
            logger.info("test_only: skipping training")
            return

        for epoch in epoch_counter:
            self._fit_train(train_set, epoch, progressbar)
            self._fit_valid(valid_set, epoch, progressbar)
            if self.debug and epoch >= self.debug_epochs:
                logger.info("Debug mode: stopping after %d epochs", epoch)
                break
            if self.optimizer_step_limit is not None and \
                    self.optimizer_step >= self.optimizer_step_limit:
                logger.info("Reached optimizer step limit (%d)",
                            self.optimizer_step_limit)
                break

    def _fit_train(self, train_set, epoch, progressbar):
        self.on_stage_start(Stage.TRAIN, epoch)
        if hasattr(train_set, "set_epoch"):
            train_set.set_epoch(epoch)
        self.step = 0
        self.avg_train_loss = 0.0
        self._pending_loss = None
        iterator = train_set
        if progressbar and if_main_process():
            from tqdm import tqdm
            iterator = tqdm(train_set, dynamic_ncols=True,
                            desc=f"Epoch {epoch}")
        # TSASR_LOG_STEP_TIMES=1: per-step wall times with a hard device
        # sync each step (defeats the async dispatch pipeline, so ONLY
        # for benchmarking — e.g. the long-utterance e2e evidence run)
        step_times = [] if os.environ.get("TSASR_LOG_STEP_TIMES") else None
        for batch in iterator:
            self.step += 1
            should_step = ((self.global_micro_step + 1) %
                           int(self.grad_accumulation_factor)) == 0
            self.on_fit_batch_start(batch, should_step)
            if step_times is not None:
                t0 = time.perf_counter()
            loss = self.fit_batch(batch)
            if step_times is not None:
                jax.block_until_ready(loss)
                step_times.append(time.perf_counter() - t0)
            self.avg_train_loss = self._update_average(
                loss, self.avg_train_loss)
            self.on_fit_batch_end(batch, None, loss, should_step)
            if progressbar and if_main_process():
                iterator.set_postfix(train_loss=f"{self.avg_train_loss:.3f}")
            self._maybe_intra_epoch_ckpt()
            if self.debug and self.step >= self.debug_batches:
                break
            if self.optimizer_step_limit is not None and \
                    self.optimizer_step >= self.optimizer_step_limit:
                break
        final_loss = self._flush_pending_loss()
        if final_loss is not None:
            self.avg_train_loss = self._update_average(
                final_loss, self.avg_train_loss)
        if step_times:
            warm = step_times[2:] or step_times
            ms = sorted(t * 1e3 for t in warm)
            logger.info(
                "step times (epoch %d, n=%d warm of %d): "
                "median %.1f ms, p90 %.1f ms, first %.1f ms", epoch,
                len(ms), len(step_times), ms[len(ms) // 2],
                ms[min(len(ms) - 1, int(0.9 * len(ms)))],
                step_times[0] * 1e3)
        self.on_stage_end(Stage.TRAIN, self.avg_train_loss, epoch)
        self.train_stats_loss = self.avg_train_loss
        self.step = 0

    def _maybe_intra_epoch_ckpt(self):
        if self.checkpointer is None:
            return
        by_minutes = self.ckpt_interval_minutes and (
            time.time() - self._last_ckpt_time
            >= self.ckpt_interval_minutes * 60)
        by_steps = self.ckpt_interval_steps and \
            self.optimizer_step > 0 and \
            self.optimizer_step % self.ckpt_interval_steps == 0 and \
            (self.step % self.grad_accumulation_factor) == 0
        if self.ckpt_interval_minutes and jax.process_count() > 1:
            # wall clocks drift across processes; a one-sided entry into
            # the collective save would deadlock — process 0 decides
            from jax.experimental import multihost_utils
            by_minutes = bool(multihost_utils.broadcast_one_to_all(
                np.asarray(bool(by_minutes))))
        if by_minutes or by_steps:
            # only intra-epoch checkpoints compete for deletion — the
            # end-of-epoch keep-N-best set is untouchable (reference
            # core.py:1241-1257 passes the same ckpt_predicate)
            self.checkpointer.save_and_keep_only(
                meta={"unfinished_epoch": True}, end_of_epoch=False,
                num_to_keep=1,
                importance_key=lambda c: c.unixtime,
                ckpt_predicate=lambda c: c.meta.get(
                    "unfinished_epoch", False))
            self._last_ckpt_time = time.time()

    def _fit_valid(self, valid_set, epoch, progressbar):
        if valid_set is None:
            return
        self.on_stage_start(Stage.VALID, epoch)
        if self._jit_eval_step is None:
            self._jit_eval_step = self._build_eval_step()
        avg_loss = 0.0
        self.step = 0
        iterator = valid_set
        if progressbar and if_main_process():
            from tqdm import tqdm
            iterator = tqdm(valid_set, dynamic_ncols=True, desc="Valid")
        for batch in iterator:
            self.step += 1
            loss = self.evaluate_batch(batch, Stage.VALID)
            avg_loss = self._update_average(loss, avg_loss)
            if self.debug and self.step >= self.debug_batches:
                break
        avg_loss = self._merge_eval_loss(avg_loss, self.step)
        self.step = 0
        self.on_stage_end(Stage.VALID, avg_loss, epoch)

    def _merge_eval_loss(self, avg_loss, n_batches):
        """Cross-process batch-weighted mean of per-shard eval losses
        (each process evaluates a disjoint sampler shard)."""
        if jax.process_count() <= 1:
            return avg_loss
        from tsasr_tpu.parallel.distributed import all_gather_object
        rows = all_gather_object([float(avg_loss), int(n_batches)])
        total = sum(n for _, n in rows)
        return (sum(loss * n for loss, n in rows) / total
                if total else avg_loss)

    def evaluate_batch(self, batch, stage):
        arrays = self._put_batch(self.batch_to_arrays(batch),
                                 local=self._local_eval())
        loss, predictions = self._jit_eval_step(
            self._get_eval_params(), arrays,
            0 if stage == Stage.VALID else 1)
        self.evaluate_batch_extra(batch, arrays, predictions, stage)
        return float(loss)

    def evaluate(self, test_set, max_key=None, min_key=None,
                 progressbar=None, test_loader_kwargs=None):
        if not isinstance(test_set, (SaveableDataLoader, LoopedLoader)):
            test_set = SaveableDataLoader(test_set,
                                          **(test_loader_kwargs or {}))
        self._ensure_initialized()
        if progressbar is None:
            progressbar = not self.noprogressbar
        self.on_evaluate_start(max_key=max_key, min_key=min_key)
        self.on_stage_start(Stage.TEST, epoch=None)
        if self._jit_eval_step is None:
            self._jit_eval_step = self._build_eval_step()
        avg_loss = 0.0
        self.step = 0
        iterator = test_set
        if progressbar and if_main_process():
            from tqdm import tqdm
            iterator = tqdm(test_set, dynamic_ncols=True, desc="Test")
        for batch in iterator:
            self.step += 1
            loss = self.evaluate_batch(batch, Stage.TEST)
            avg_loss = self._update_average(loss, avg_loss)
            if self.debug and self.step >= self.debug_batches:
                break
        avg_loss = self._merge_eval_loss(avg_loss, self.step)
        self.step = 0
        self.on_stage_end(Stage.TEST, avg_loss, epoch=None)
        return avg_loss


class _BrainState:
    """Checkpoint adapter for the Brain's train state.

    ``collective_save``: on a multi-host mesh the params/opt-state
    leaves are not host-addressable from process 0 alone; ``save`` runs
    on every process (gather_to_host is a collective) and only process 0
    writes (``checkpoints.Checkpointer.save_checkpoint`` discipline).
    """

    collective_save = True

    def __init__(self, brain):
        self.brain = brain

    def save(self, path):
        from flax import serialization
        from tsasr_tpu.training.checkpoints import gather_to_host
        payload = {
            "params": gather_to_host(self.brain.params),
            "opt_state": gather_to_host(self.brain.opt_state),
            "optimizer_step": self.brain.optimizer_step,
            "global_micro_step": self.brain.global_micro_step,
        }
        if jax.process_index() != 0:
            return
        state_dict = serialization.to_state_dict(payload)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree.map(np.asarray, state_dict)))

    def load(self, path, end_of_epoch=True):
        from flax import serialization
        with open(path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        brain = self.brain
        brain.optimizer_step = int(restored["optimizer_step"])
        brain.global_micro_step = int(restored.get(
            "global_micro_step",
            brain.optimizer_step * int(brain.grad_accumulation_factor)))
        if brain.params is not None:
            brain.params = serialization.from_state_dict(
                brain.params, restored["params"])
            if brain.mesh is not None:
                # restored leaves are host arrays; lay them back out on
                # the mesh so the compiled step sees its input shardings
                from tsasr_tpu.parallel.mesh import param_shardings
                shardings = param_shardings(brain.params, brain.mesh)
                brain.params = jax.tree.map(jax.device_put, brain.params,
                                            shardings)
            if brain.opt_state is not None:
                brain.opt_state = serialization.from_state_dict(
                    brain.opt_state, restored["opt_state"])
            else:
                brain._restored_opt_state = restored["opt_state"]
        else:
            brain._restored = restored
