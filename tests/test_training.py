"""Training-runtime tests: hparams loader, schedulers, epoch loop,
checkpointer, metrics, and the loss-goes-down Brain oracle.

Mirrors the reference coverage: ``test_checkpoints.py``,
``test_epoch_loop.py``, ``test_metrics.py``, ``test_core.py`` (SimpleBrain
must reduce loss after fit), plus YAML-load tests (``test_yaml.py``).
"""

import io
import os

import numpy as np
import pytest

from tsasr_tpu.training.checkpoints import Checkpointer, PytreeRecoverable
from tsasr_tpu.training.epoch_loop import (
    EpochCounter,
    EpochCounterWithStopper,
)
from tsasr_tpu.training.schedulers import NewBobScheduler, NoamScheduler
from tsasr_tpu.utils.hparams import load_hyperpyyaml
from tsasr_tpu.utils.metric_stats import ErrorRateStats


class TestHparams:
    def test_ref_and_arithmetic(self):
        yaml_text = """
a: 3
b: !ref <a>
c: !ref <a> * 2 + 1
d: !ref results/<a>/x
"""
        h = load_hyperpyyaml(yaml_text)
        assert h["b"] == 3 and h["c"] == 7 and h["d"] == "results/3/x"

    def test_new_name_apply(self):
        yaml_text = """
counter: !new:tsasr_tpu.training.epoch_loop.EpochCounter
    limit: 5
factory: !name:tsasr_tpu.training.epoch_loop.EpochCounter
applied: !apply:math.sqrt [16]
"""
        h = load_hyperpyyaml(yaml_text)
        assert isinstance(h["counter"], EpochCounter)
        assert h["counter"].limit == 5
        assert h["factory"]().limit >= 0 if False else callable(h["factory"])
        assert h["applied"] == 4.0

    def test_placeholder_requires_override(self):
        with pytest.raises(ValueError, match="PLACEHOLDER"):
            load_hyperpyyaml("x: !PLACEHOLDER\n")
        h = load_hyperpyyaml("x: !PLACEHOLDER\n", overrides={"x": 7})
        assert h["x"] == 7

    def test_cli_style_overrides(self):
        h = load_hyperpyyaml("lr: 0.001\nname: foo\n",
                             overrides="lr: 0.01")
        assert h["lr"] == 0.01

    def test_unknown_override_rejected(self):
        with pytest.raises(KeyError):
            load_hyperpyyaml("a: 1\n", overrides={"zzz": 2})

    def test_tuple_strings(self):
        yaml_text = """
sched: !new:tsasr_tpu.training.optimizers.make_adamw
    betas: (0.9, 0.98)
"""
        h = load_hyperpyyaml(yaml_text)
        assert callable(h["sched"])

    def test_recipe_yamls_load(self):
        root = os.path.join(os.path.dirname(__file__), "..", "hparams",
                            "LibriSpeechMix")
        for name in os.listdir(root):
            with open(os.path.join(root, name)) as f:
                h = load_hyperpyyaml(f, overrides={"data_folder": "/tmp"})
            assert "model" in h and "opt_class" in h, name


class TestSchedulers:
    def test_noam_pinned_values(self):
        # reference docstring values (nnet/schedulers.py:385-396)
        sched = NoamScheduler(lr_initial=1.0, n_warmup_steps=3)
        lrs = [sched()[1] for _ in range(3)]
        np.testing.assert_allclose(
            lrs, [1 / 3, 2 / 3, 0.9999999999999999], rtol=1e-9)

    def test_noam_schedule_fn_matches_stateful(self):
        sched = NoamScheduler(lr_initial=1e-3, n_warmup_steps=100)
        fn = sched.as_schedule_fn()
        host = [sched()[1] for _ in range(250)]
        dev = [float(fn(i + 1)) for i in range(250)]
        np.testing.assert_allclose(host, dev, rtol=1e-5)

    def test_newbob_anneals(self):
        sched = NewBobScheduler(initial_value=1.0, annealing_factor=0.5)
        sched(10.0)
        old, new = sched(10.0)  # no improvement
        assert new == 0.5
        old, new = sched(1.0)   # big improvement
        assert new == 0.5


class TestEpochLoop:
    def test_resume_end_of_epoch(self, tmp_path):
        c = EpochCounter(10)
        for e in c:
            if e == 3:
                break
        path = str(tmp_path / "c.json")
        c.save(path)
        c2 = EpochCounter(10)
        c2.load(path, end_of_epoch=True)
        assert next(c2) == 4
        c3 = EpochCounter(10)
        c3.load(path, end_of_epoch=False)
        assert next(c3) == 3  # repeat interrupted epoch

    def test_stopper(self):
        c = EpochCounterWithStopper(limit=10, limit_to_stop=2,
                                    limit_warmup=1, direction="min")
        seen = []
        for e in c:
            seen.append(e)
            c.update_metric(5.0)  # never improves after first
        assert seen[-1] < 10


class TestCheckpointer:
    def make_state(self):
        return {"w": np.arange(4, dtype=np.float32)}

    def test_roundtrip_and_keep_best(self, tmp_path):
        state = self.make_state()
        rec = PytreeRecoverable(lambda: state,
                                lambda new: state.update(new))
        ckpt = Checkpointer(str(tmp_path), {"model": rec})
        for i, wer in enumerate([30.0, 20.0, 25.0, 40.0]):
            state["w"] = np.full(4, i, np.float32)
            ckpt.save_and_keep_only(meta={"WER": wer}, num_to_keep=2,
                                    min_keys=["WER"],
                                    name=f"CKPT+{i:04d}")
        remaining = ckpt.list_checkpoints()
        wers = sorted(c.meta["WER"] for c in remaining)
        assert wers == [20.0, 25.0]
        # recover best
        best = ckpt.recover_if_possible(min_key="WER")
        assert best.meta["WER"] == 20.0
        assert state["w"][0] == 1.0  # saved at i=1

    def test_missing_recoverable_raises(self, tmp_path):
        state = self.make_state()
        rec = PytreeRecoverable(lambda: state,
                                lambda new: state.update(new))
        ckpt = Checkpointer(str(tmp_path), {"model": rec})
        ckpt.save_checkpoint(name="CKPT+x")
        ckpt2 = Checkpointer(str(tmp_path),
                             {"model": rec, "extra": rec})
        with pytest.raises(FileNotFoundError):
            ckpt2.recover_if_possible()

    def test_intra_epoch_predicate_protects_best_set(self, tmp_path):
        """Intra-epoch saves (num_to_keep=1, predicate=unfinished) must
        never delete the end-of-epoch keep-N-best checkpoints."""
        state = self.make_state()
        rec = PytreeRecoverable(lambda: state,
                                lambda new: state.update(new))
        ckpt = Checkpointer(str(tmp_path), {"model": rec})
        for i, wer in enumerate([30.0, 20.0, 25.0]):
            ckpt.save_and_keep_only(meta={"WER": wer}, num_to_keep=3,
                                    min_keys=["WER"], name=f"CKPT+{i:04d}")
        for j in range(2):
            ckpt.save_and_keep_only(
                meta={"unfinished_epoch": True}, end_of_epoch=False,
                num_to_keep=1, name=f"CKPT+intra{j}",
                importance_key=lambda c: c.unixtime,
                ckpt_predicate=lambda c: c.meta.get(
                    "unfinished_epoch", False))
        remaining = ckpt.list_checkpoints()
        wers = sorted(c.meta.get("WER", -1) for c in remaining)
        # 3 best-WER ckpts intact + exactly 1 intra-epoch ckpt
        assert wers == [-1, 20.0, 25.0, 30.0]
        intra = [c for c in remaining
                 if c.meta.get("unfinished_epoch", False)]
        assert len(intra) == 1 and intra[0].path.endswith("intra1")

    def test_end_of_epoch_flag_threaded(self, tmp_path):
        c = EpochCounter(10)
        next(c)
        ckpt = Checkpointer(str(tmp_path), {"counter": c})
        ckpt.save_checkpoint(end_of_epoch=False, name="CKPT+mid")
        c2 = EpochCounter(10)
        ckpt2 = Checkpointer(str(tmp_path), {"counter": c2})
        ckpt2.recover_if_possible()
        assert next(c2) == 1  # repeats the interrupted epoch


class TestErrorRateStats:
    def test_wer_value(self):
        m = ErrorRateStats()
        m.append(["u1"], [["the", "cat", "sat"]],
                 [["the", "cat", "sat"]])
        m.append(["u2"], [["a", "dog"]], [["the", "dog", "ran"]])
        # u2: sub(a/the) + del(ran) = 2 edits / 3 ref; total 2/6
        assert m.summarize("error_rate") == pytest.approx(100 * 2 / 6)

    def test_cer_split_tokens(self):
        m = ErrorRateStats(split_tokens=True)
        m.append(["u1"], [["ab"]], [["ac"]])
        assert m.summarize("error_rate") == pytest.approx(50.0)

    def test_write_stats_format(self):
        m = ErrorRateStats()
        m.append(["u1"], [["a", "b"]], [["a", "c"]])
        m.summarize()
        buf = io.StringIO()
        m.write_stats(buf)
        text = buf.getvalue()
        assert text.startswith("%WER 50.00 [ 1 / 2")
        assert "ALIGNMENTS" in text and "u1, %WER 50.00" in text

    def test_distributed_merge_dedup(self):
        m = ErrorRateStats()
        m.append(["u1", "u2"], [["a"], ["b"]], [["a"], ["b"]])
        other = [{**s} for s in m.scores]  # duplicated shard
        m.merge_distributed([m.scores, other])
        assert len(m.scores) == 2


class TestBrainLossGoesDown:
    def test_simple_brain_reduces_loss(self):
        """The reference trainer oracle (test_core.py:12-40): a tiny
        Brain must reduce its loss after fit()."""
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from tsasr_tpu.data.batch import PaddedBatch
        from tsasr_tpu.training.brain import Brain
        from tsasr_tpu.training.epoch_loop import EpochCounter
        from tsasr_tpu.training.optimizers import make_adamw
        from tsasr_tpu.utils.stage import Stage

        class TinyModel(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(1)(nn.tanh(nn.Dense(8)(x)))

        model = TinyModel()
        rng = np.random.default_rng(0)
        X = rng.normal(size=(32, 4)).astype(np.float32)
        y = (X @ np.asarray([[1.0], [-2.0], [0.5], [0.0]])
             ).astype(np.float32)

        class SimpleBrain(Brain):
            def make_example_batch(self):
                return {"x": X[:8], "y": y[:8]}

            def _init_params(self, rng_key, example):
                return model.init(rng_key, jnp.asarray(example["x"]))

            def batch_to_arrays(self, batch):
                return {"x": batch.x.data, "y": batch.y.data}

            def compute_forward(self, params, batch, stage, rng_key):
                return model.apply(params, batch["x"])

            def compute_objectives(self, predictions, batch, stage):
                return jnp.mean((predictions - batch["y"]) ** 2)

        data = [{"x": X[i], "y": y[i]} for i in range(32)]

        class ListDataset:
            def __len__(self):
                return len(data)

            def __getitem__(self, i):
                return data[i]

        brain = SimpleBrain(
            modules={"model": model}, opt_class=make_adamw(lr=0.03),
            hparams={"seed": 0}, run_opts={"noprogressbar": True,
                                           "grad_accumulation_factor": 1})

        losses = []
        orig = brain.fit_batch

        def spy(batch):
            loss = orig(batch)
            losses.append(loss)
            return loss

        brain.fit_batch = spy
        brain.fit(EpochCounter(8), ListDataset(),
                  train_loader_kwargs={"batch_size": 8})
        # first batch of each epoch reports NaN (async one-step-delayed
        # loss fetch); filter before comparing
        losses = [l for l in losses if np.isfinite(l)]
        assert np.mean(losses[-4:]) < 0.5 * np.mean(losses[:4])


def _make_linear_brain(X, y, run_opts, lr=0.1):
    """A tiny SGD Brain on a fixed linear problem (shared by the
    accumulation / nonfinite-skip tests)."""
    import jax.numpy as jnp
    from flax import linen as nn

    from tsasr_tpu.training.brain import Brain

    class LinModel(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1, use_bias=False)(x)

    model = LinModel()

    class LinBrain(Brain):
        def make_example_batch(self):
            return {"x": X[:2], "y": y[:2]}

        def _init_params(self, rng_key, example):
            return model.init(rng_key, jnp.asarray(example["x"]))

        def batch_to_arrays(self, batch):
            return batch

        def compute_forward(self, params, batch, stage, rng_key):
            return model.apply(params, batch["x"])

        def compute_objectives(self, predictions, batch, stage):
            return jnp.mean((predictions - batch["y"]) ** 2)

    def opt_class(learning_rate=None):
        import optax
        return optax.sgd(learning_rate or lr)

    brain = LinBrain(modules={"model": model}, opt_class=opt_class,
                     hparams={"seed": 0},
                     run_opts={"noprogressbar": True,
                               "max_grad_norm": 1e9, **run_opts})
    brain._ensure_initialized()
    brain.init_optimizers()
    brain._jit_train_step = brain._build_train_step()
    return brain, model


class TestBrainStepSemantics:
    def test_accumulated_step_equals_full_batch(self):
        """Two micro-batches through the Brain (accum=2) must produce
        the same parameters as one full-batch SGD step — i.e. no k×
        double-scaling of the accumulated gradients."""
        import jax
        import jax.numpy as jnp
        import optax

        rng = np.random.default_rng(0)
        X = rng.normal(size=(8, 4)).astype(np.float32)
        y = (X @ np.asarray([[1.0], [-2.0], [0.5], [3.0]],
                            np.float32)).astype(np.float32)

        brain, model = _make_linear_brain(
            X, y, {"grad_accumulation_factor": 2})
        p0 = jax.tree.map(np.asarray, brain.params)

        # reference: one SGD step on grad of mean over both halves
        def loss_fn(p, xs, ys):
            return jnp.mean((model.apply(p, xs) - ys) ** 2)

        g1 = jax.grad(loss_fn)(brain.params, X[:4], y[:4])
        g2 = jax.grad(loss_fn)(brain.params, X[4:], y[4:])
        g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
        p_ref = optax.apply_updates(
            brain.params, jax.tree.map(lambda g: -0.1 * g, g_mean))

        brain.fit_batch({"x": X[:4], "y": y[:4]})
        mid = jax.tree.map(np.asarray, brain.params)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(mid)):
            np.testing.assert_allclose(a, b)  # no update mid-accum
        assert brain.optimizer_step == 0
        brain.fit_batch({"x": X[4:], "y": y[4:]})
        assert brain.optimizer_step == 1
        for a, b in zip(jax.tree.leaves(p_ref),
                        jax.tree.leaves(brain.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_nonfinite_batch_fully_skipped(self):
        """A NaN-loss micro-batch must not advance params, the
        MultiSteps micro-step, or the host step counters (reference
        skips the batch entirely, core.py:1115-1150)."""
        import jax

        rng = np.random.default_rng(0)
        X = rng.normal(size=(8, 4)).astype(np.float32)
        y = (X @ np.asarray([[1.0], [-2.0], [0.5], [3.0]],
                            np.float32)).astype(np.float32)
        brain, _ = _make_linear_brain(
            X, y, {"grad_accumulation_factor": 2,
                   "nonfinite_patience": 10})

        Xbad = X[:4].copy()
        Xbad[0, 0] = np.nan
        p0 = jax.tree.map(np.asarray, brain.params)
        brain.fit_batch({"x": Xbad, "y": y[:4]})
        brain._flush_pending_loss()  # consume → detect nonfinite
        for a, b in zip(jax.tree.leaves(p0),
                        jax.tree.leaves(brain.params)):
            np.testing.assert_allclose(a, np.asarray(b))
        assert brain.global_micro_step == 0
        assert brain.nonfinite_count == 1
        # MultiSteps mini_step on device also did not advance
        assert int(brain.opt_state.mini_step) == 0

        # two good batches now complete one full optimizer step
        brain.fit_batch({"x": X[:4], "y": y[:4]})
        brain.fit_batch({"x": X[4:], "y": y[4:]})
        brain._flush_pending_loss()
        assert brain.optimizer_step == 1
        assert int(brain.opt_state.gradient_step) == 1


class TestAugmentHparams:
    """The augmentation block is YAML-driven: every SpecAugment /
    SpeedPerturb parameter flows from hparams (CLI-overridable) into the
    jitted train step (reference exposes the same keys,
    ``conformer-t_scratch.yaml:131-145``)."""

    def test_yaml_override_reaches_kwargs(self):
        from tsasr_tpu.recipes.librispeechmix import (
            specaugment_kwargs,
            speed_perturb_kwargs,
        )
        root = os.path.join(os.path.dirname(__file__), "..", "hparams",
                            "LibriSpeechMix")
        with open(os.path.join(root, "conformer-t_scratch.yaml")) as f:
            h = load_hyperpyyaml(f, overrides={
                "data_folder": "/tmp", "time_warp_window": 10,
                "n_time_mask": 3, "speeds": [90, 100, 110]})
        kw = specaugment_kwargs(h)
        assert kw["time_warp_window"] == 10
        assert kw["n_time_mask"] == 3
        assert kw["freq_mask_width"] == 30   # untouched default
        sp = speed_perturb_kwargs(h, h["sample_rate"])
        assert sp["speeds"] == (90, 100, 110)
        assert sp["sample_rate"] == 16000

    def test_hparams_change_jitted_step_output(self):
        """--time_mask_width (etc.) actually changes the train-time
        feature pipeline output for a fixed PRNG key."""
        import jax
        from tsasr_tpu.recipes.librispeechmix import TSASRBrain
        from tsasr_tpu.utils.stage import Stage

        base = {"sample_rate": 16000, "n_fft": 512, "n_mels": 80,
                "win_length": 32, "augment": True, "speed_perturb": False,
                "time_warp": False, "freq_mask": False,
                "time_mask": True, "n_time_mask": 2,
                "time_mask_width": 1, "replace_with_zero": True}
        wav = np.random.default_rng(0).normal(
            size=(2, 16000)).astype(np.float32) * 0.1
        batch = {"mixed_sig": wav, "mixed_lens": np.ones(2, np.float32)}

        outs = []
        for width in (1, 40):
            h = dict(base, time_mask_width=width)
            brain = TSASRBrain(modules={}, hparams=h, variant="none")
            feats, _ = brain._mixture_features(
                batch, Stage.TRAIN, jax.random.PRNGKey(0))
            outs.append(np.asarray(feats))
        assert not np.allclose(outs[0], outs[1])


class TestLoggingSetup:
    def test_noisy_third_party_loggers_clamped(self, tmp_path):
        """setup_logging must not let jax's own NOTSET stderr handler
        emit per-dispatch DEBUG spam once the root level is DEBUG
        (measured: 57 MB log.txt per north-star run before the clamp)."""
        import logging

        from tsasr_tpu.utils.logger import setup_logging

        root = logging.getLogger()
        old_handlers, old_level = root.handlers[:], root.level
        try:
            root.handlers = []
            setup_logging(str(tmp_path / "log.txt"))
            assert root.level == logging.DEBUG
            assert logging.getLogger("jax").level == logging.INFO
            # a child such as jax._src.dispatch inherits the clamp
            assert not logging.getLogger(
                "jax._src.dispatch").isEnabledFor(logging.DEBUG)
            # our own tree still records DEBUG to the file
            logging.getLogger("tsasr_tpu.test").debug("kept")
            for h in root.handlers:
                h.flush()
            assert "kept" in (tmp_path / "log.txt").read_text()
        finally:
            root.handlers = old_handlers
            root.setLevel(old_level)


class TestEvaluateRecoveredEpoch:
    def test_epoch_loaded_reports_keep_best_epoch(self, tmp_path):
        """keep-best may recover an EARLIER epoch than the fit loop's
        last; the reported epoch must be the recovered one (r5 fix: the
        old `>` guard kept the fit-loop value, mislabeling e.g. a
        recovered epoch-2 best as epoch 3)."""
        from tsasr_tpu.recipes.librispeechmix import TSASRBrain
        from tsasr_tpu.training.checkpoints import Checkpointer
        from tsasr_tpu.training.epoch_loop import EpochCounter

        counter = EpochCounter(limit=3)
        ck = Checkpointer(str(tmp_path), recoverables={"counter": counter},
                          allow_partial_load=True)
        for epoch, wer in ((1, 5.0), (2, 1.0), (3, 4.0)):
            counter.current = epoch
            ck.save_checkpoint(meta={"WER": wer})
        brain = TSASRBrain(
            hparams={"epoch_counter": counter, "sample_rate": 16000,
                     "n_fft": 400, "n_mels": 80, "win_length": 25.0},
            checkpointer=ck)
        brain._current_epoch = 3  # as left by the fit loop
        brain.on_evaluate_start(min_key="WER")
        assert brain._recovered_ckpt.meta["WER"] == 1.0
        assert counter.current == 2
        assert brain._current_epoch == 2
