"""LibriSpeechMix TS-ASR recipe: Brain subclass + experiment main.

TPU-native re-implementation of the reference recipe layer
(``/root/reference/train_librispeechmix_{none,scratch,pretrained}.py``):

- ``TSASRBrain.compute_forward`` mirrors the reference forward
  (``train_librispeechmix_scratch.py:34-135``): speaker features ->
  speaker encoder -> masked pooling -> projection; mixture features ->
  (speed perturb) -> fbank -> sentence norm -> (SpecAugment) -> conv
  frontend -> TS-Conformer with injection -> joint logits. Here the whole
  chain, features included, runs inside one jitted step on device.
- ``compute_objectives`` is the RNN-T loss with example weights (weights
  are 1 for real rows, 0 for rows added by static-shape batch padding —
  exact masking where the reference DDP duplicates examples).
- Decoding/metrics/logging/checkpoint hooks mirror
  ``train_librispeechmix_scratch.py:137-276``: greedy every
  ``valid_search_freq`` epochs at VALID, beam at TEST, CER/WER
  accumulation with cross-process merge + dedup, keep-N-best checkpoints
  on min WER, Kaldi-style wer file, prompt-mode two-pass evaluation.

Three variants select the speaker-conditioning path (SURVEY.md §0):
``none`` (no conditioning), ``scratch`` (Conformer speaker encoder
trained jointly), ``pretrained`` (frozen WavLM d-vectors, precomputed on
host — the reference also runs its speaker model frozen under no_grad).
"""

import itertools
import json
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from tsasr_tpu.data import (
    DynamicBatchSampler,
    DynamicItemDataset,
    prepare_librispeechmix,
    train_tokenizer,
)
from tsasr_tpu.data.dataset import add_dynamic_item, set_output_keys
from tsasr_tpu.data.mixing import make_audio_pipeline, make_text_pipeline
from tsasr_tpu.decoding import TransducerBeamSearcher, \
    TransducerGreedySearcher
from tsasr_tpu.ops import (Fbank, input_normalization,
                           pad_audio_to_frame_multiple, transducer_loss)
from tsasr_tpu.ops.augment import spec_augment, speed_perturb
from tsasr_tpu.ops.rnnt_loss import rnnt_loss
from tsasr_tpu.parallel.distributed import (
    all_gather_object,
    if_main_process,
    run_on_main,
)
from tsasr_tpu.training.brain import Brain
from tsasr_tpu.utils.stage import Stage

logger = logging.getLogger(__name__)


def _hparams_get(hparams):
    """Uniform getter over dict-or-namespace hparams."""
    if hasattr(hparams, "get"):
        return hparams.get
    return lambda k, d=None: getattr(hparams, k, d)


def specaugment_kwargs(hparams):
    """SpecAugment parameters from hparams with the reference recipe's
    YAML keys and defaults (``conformer-t_scratch.yaml:131-141``) — every
    key is CLI-overridable (e.g. ``--time_warp_window 10``)."""
    get = _hparams_get(hparams)
    return dict(
        time_warp=bool(get("time_warp", True)),
        time_warp_window=int(get("time_warp_window", 5)),
        freq_mask=bool(get("freq_mask", True)),
        freq_mask_width=get("freq_mask_width", 30),
        n_freq_mask=int(get("n_freq_mask", 2)),
        time_mask=bool(get("time_mask", True)),
        time_mask_width=get("time_mask_width", 20),
        n_time_mask=int(get("n_time_mask", 2)),
        replace_with_zero=bool(get("replace_with_zero", False)),
    )


def speed_perturb_kwargs(hparams, sample_rate=16000):
    """SpeedPerturb parameters (reference ``speeds: [95, 100, 105]``,
    ``conformer-t_scratch.yaml:143-145``)."""
    get = _hparams_get(hparams)
    return dict(speeds=tuple(get("speeds", (95, 100, 105)) or
                             (95, 100, 105)),
                sample_rate=int(get("sample_rate", sample_rate)))


def resolve_speaker_backend(hparams):
    """Pick the frozen-speaker-encoder backend for the ``pretrained``
    variant: ``jax`` (on-device flax WavLM-XVector port, full parity) or
    ``torch_cache`` (host HF model + disk d-vector cache). ``auto``
    (default) selects jax when ``speaker_encoder_path`` is a local
    checkpoint directory, else torch_cache (hub ids need HF/torch)."""
    get = hparams.get if hasattr(hparams, "get") else (
        lambda k, d=None: getattr(hparams, k, d))
    backend = get("speaker_encoder_backend", "auto")
    if backend != "auto":
        return backend
    path = get("speaker_encoder_path", "")
    if path and os.path.isdir(path) and os.path.exists(
            os.path.join(path, "config.json")):
        return "jax"
    return "torch_cache"


class TSASRBrain(Brain):
    """Target-speaker ASR trainer over a ``TSTransducer`` model."""

    def __init__(self, *args, variant="scratch", tokenizer=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.variant = variant
        self.tokenizer = tokenizer
        self.fbank = Fbank(
            sample_rate=self.hparams.sample_rate,
            n_fft=self.hparams.n_fft, n_mels=self.hparams.n_mels,
            win_length=float(self.hparams.win_length))
        self._current_epoch = 0
        self._greedy = None
        self._beam = None
        self.speaker_encoder = None
        if (variant == "pretrained"
                and resolve_speaker_backend(self.hparams) == "jax"):
            from tsasr_tpu.recipes.speaker_embeddings import \
                JaxSpeakerEncoder
            self.speaker_encoder = JaxSpeakerEncoder(
                self.hparams.speaker_encoder_path,
                frame_level=(getattr(self.hparams, "injection_mode", None)
                             == "cross_attention"),
                embedding_dim=self.hparams.speaker_embedding_dim)

    # ------------------------------------------------------------ batches
    def batch_to_arrays(self, batch):
        # Derive labels from tokens_bos ([blank] + tokens) so the padded
        # label width is exactly logits' U dimension minus one, whatever
        # the quantized padding chose.
        tokens_bos = batch.tokens_bos.data.astype(np.int32)
        abs_token_lens = np.round(
            batch.tokens.lengths
            * batch.tokens.data.shape[1]).astype(np.int64)
        arrays = {
            "mixed_sig": batch.mixed_sig.data.astype(np.float32),
            "mixed_lens": batch.mixed_sig.lengths,
            "tokens_bos": tokens_bos,
            "tokens": tokens_bos[:, 1:],
            "tokens_lens": (abs_token_lens
                            / max(tokens_bos.shape[1] - 1, 1)
                            ).astype(np.float32),
            "weight": np.ones(len(batch), np.float32),
        }
        if self.variant == "scratch" or self.speaker_encoder is not None:
            arrays["enroll_sig"] = batch.enroll_sig.data.astype(np.float32)
            arrays["enroll_lens"] = batch.enroll_sig.lengths
        elif self.variant == "pretrained":
            arrays["speaker_embs"] = \
                batch.speaker_emb.data.astype(np.float32)
            arrays["enroll_lens"] = batch.speaker_emb.lengths
        return arrays

    def make_example_batch(self):
        sr = self.hparams.sample_rate
        batch = {
            "mixed_sig": np.zeros((2, sr), np.float32),
            "mixed_lens": np.ones(2, np.float32),
            "tokens_bos": np.zeros((2, 4), np.int32),
            "tokens": np.zeros((2, 3), np.int32),
            "tokens_lens": np.ones(2, np.float32),
            "weight": np.ones(2, np.float32),
        }
        if self.variant == "scratch" or self.speaker_encoder is not None:
            batch["enroll_sig"] = np.zeros((2, sr), np.float32)
            batch["enroll_lens"] = np.ones(2, np.float32)
        elif self.variant == "pretrained":
            dim = self.hparams.speaker_embedding_dim
            batch["speaker_embs"] = np.zeros((2, 1, dim), np.float32)
            batch["enroll_lens"] = np.ones(2, np.float32)
        return batch

    def _init_params(self, rng, example):
        kwargs = self._forward_kwargs(example)
        feats, rel = self._mixture_features(example, Stage.VALID,
                                            jax.random.PRNGKey(0))
        return self.model.init(rng, feats, rel,
                               jnp.asarray(example["tokens_bos"]),
                               **kwargs)

    # ------------------------------------------------------------ forward
    def _mixture_features(self, batch, stage, rng):
        wav = jnp.asarray(batch["mixed_sig"])
        rel = jnp.asarray(batch["mixed_lens"])
        augment = bool(getattr(self.hparams, "augment", False))
        if augment and stage == Stage.TRAIN:
            if bool(getattr(self.hparams, "speed_perturb", True)):
                k_speed, rng = jax.random.split(rng)
                wav, factor = speed_perturb(
                    wav, k_speed, **speed_perturb_kwargs(
                        self.hparams, self.hparams.sample_rate))
                rel = jnp.minimum(rel * factor, 1.0)
        pad_to = getattr(self.hparams, "pad_feats_to", None)
        if pad_to:
            # MXU tiling: pad the waveform so the fbank frame count (and
            # hence the post-subsample encoder frame count) is aligned;
            # semantically identical to bucket padding — see
            # ops/features.py::pad_audio_to_frame_multiple
            wav, rel = pad_audio_to_frame_multiple(
                wav, rel, int(pad_to), self.hparams.sample_rate,
                float(self.fbank.config.hop_length))
        feats = self.fbank(wav)
        feats = input_normalization(feats, rel)
        if augment and stage == Stage.TRAIN:
            k_spec, rng = jax.random.split(rng)
            feats = spec_augment(feats, k_spec,
                                 **specaugment_kwargs(self.hparams))
        return feats, rel

    def _forward_kwargs(self, batch):
        if self.variant == "scratch":
            esig = jnp.asarray(batch["enroll_sig"])
            erel = jnp.asarray(batch["enroll_lens"])
            pad_to = getattr(self.hparams, "pad_feats_to", None)
            if pad_to:
                esig, erel = pad_audio_to_frame_multiple(
                    esig, erel, int(pad_to), self.hparams.sample_rate,
                    float(self.fbank.config.hop_length))
            efeats = input_normalization(self.fbank(esig), erel)
            return {"enroll_feats": efeats, "enroll_rel_lens": erel}
        if self.variant == "pretrained":
            erel = jnp.asarray(batch["enroll_lens"])
            if self.speaker_encoder is not None:
                # full-parity path: frozen JAX WavLM-XVector in-jit
                # (reference runs HF under no_grad per batch,
                # train_librispeechmix_pretrained.py:45-63)
                embs = self.speaker_encoder.embed(
                    jnp.asarray(batch["enroll_sig"]), erel)
                return {"external_speaker_embs": embs,
                        "enroll_rel_lens": erel}
            return {"external_speaker_embs":
                    jnp.asarray(batch["speaker_embs"]),
                    "enroll_rel_lens": erel}
        return {}

    def _fused_loss_active(self):
        """Fused joint+head+loss (ops.rnnt_loss_fused): the (B,T,U+1,J)
        joint never materializes. Applicable to the recipe-default sum
        joint when the banded approximation is off; ``fused_joint_loss:
        false`` in the yaml opts out."""
        if getattr(self.hparams, "joint_band_width", None):
            return False
        cfg = getattr(self.model, "config", None)
        if cfg is None or cfg.joint_mode != "sum":
            return False
        return bool(getattr(self.hparams, "fused_joint_loss", True))

    def _encoder_mesh(self, stage):
        """Mesh routed into the model forward when it carries an
        encoder-parallel axis ('seq'/'pipe'); plain dp/tp meshes stay
        out of the model (XLA propagates those shardings from the
        batch/params). Multi-process eval is process-local
        (``Brain._local_eval``), so no mesh reaches the model there."""
        m = self.mesh
        if m is None or not (set(m.axis_names) & {"seq", "pipe"}):
            return None
        if stage != Stage.TRAIN and self._local_eval():
            return None
        return m

    def compute_forward(self, params, batch, stage, rng):
        feats, rel = self._mixture_features(batch, stage, rng)
        kwargs = self._forward_kwargs(batch)
        enc_mesh = self._encoder_mesh(stage)
        if enc_mesh is not None:
            kwargs["mesh"] = enc_mesh
        deterministic = stage != Stage.TRAIN
        apply_kwargs = {}
        if not deterministic:
            apply_kwargs["rngs"] = {"dropout": rng}
        band = getattr(self.hparams, "joint_band_width", None)
        model = self.model
        if self._fused_loss_active():
            enc_out, dec_out = model.apply(
                params, feats, rel, jnp.asarray(batch["tokens_bos"]),
                deterministic=deterministic,
                method=model.encode_predict, **kwargs, **apply_kwargs)
            head = params["params"]["transducer_head"]
            fused = (enc_out, dec_out, head["kernel"], head["bias"])
            return fused, enc_out, rel
        if band:
            kwargs["band_width"] = int(band)
            kwargs["token_rel_lens"] = jnp.asarray(batch["tokens_lens"])
        logits, enc_out = model.apply(
            params, feats, rel, jnp.asarray(batch["tokens_bos"]),
            deterministic=deterministic, **kwargs, **apply_kwargs)
        # rel is returned so the loss masks (and banded centers) use the
        # SAME lengths the model encoded with — speed perturb rescales
        # them in training, so batch["mixed_lens"] would disagree
        return logits, enc_out, rel

    def compute_objectives(self, predictions, batch, stage):
        # multi-process eval batches are process-local (disjoint sampler
        # shards), so the loss kernels must not shard over the global
        # mesh there; training always rides the mesh
        mesh = self.mesh if (stage == Stage.TRAIN
                             or not self._local_eval()) else None
        logits, _, rel = predictions
        tokens = jnp.asarray(batch["tokens"])
        target_lens = jnp.round(jnp.asarray(batch["tokens_lens"])
                                * tokens.shape[1]).astype(jnp.int32)
        if isinstance(logits, tuple):          # fused joint+head+loss
            from tsasr_tpu.ops.rnnt_loss_fused import rnnt_loss_fused
            enc_out, dec_out, head_w, head_b = logits
            input_lens = jnp.round(
                rel * enc_out.shape[1]).astype(jnp.int32)
            losses = rnnt_loss_fused(
                enc_out, dec_out, head_w, head_b, tokens, input_lens,
                target_lens, blank=self.hparams.blank_index,
                reduction="none",
                chunk=int(getattr(self.hparams, "fused_loss_chunk", 8)),
                use_pallas="auto", mesh=mesh)
            w = jnp.asarray(batch["weight"])
            return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
        input_lens = jnp.round(rel * logits.shape[1]).astype(jnp.int32)
        band = getattr(self.hparams, "joint_band_width", None)
        if band:
            # banded joint: logits are (B, T', W, V); recompute the same
            # deterministic band centers the model used
            from tsasr_tpu.ops.rnnt_loss_banded import (
                band_centers,
                rnnt_loss_banded,
            )
            centers = band_centers(input_lens, target_lens,
                                   logits.shape[1], int(band))
            losses = rnnt_loss_banded(logits, tokens, centers, input_lens,
                                      target_lens,
                                      blank=self.hparams.blank_index,
                                      reduction="none")
        else:
            # Under a multi-device mesh the fused Pallas kernel runs per
            # data shard via shard_map (pad_batch_to makes B divide the
            # data axis); single-device it is a plain custom call.
            losses = rnnt_loss(logits, tokens, input_lens, target_lens,
                               blank=self.hparams.blank_index,
                               reduction="none", use_pallas="auto",
                               mesh=mesh)
        w = jnp.asarray(batch["weight"])
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)

    def on_evaluate_start(self, max_key=None, min_key=None):
        super().on_evaluate_start(max_key=max_key, min_key=min_key)
        # report the RECOVERED epoch: after recovery the epoch counter
        # holds the loaded checkpoint's epoch, which keep-best selection
        # may place BEFORE the fit loop's final epoch (the old `>` guard
        # kept the fit-loop value and mislabeled e.g. a recovered
        # epoch-19 best as "Epoch loaded: 20")
        counter = getattr(self.hparams, "epoch_counter", None)
        if counter is not None and (
                getattr(self, "_recovered_ckpt", None) is not None
                or counter.current > self._current_epoch):
            self._current_epoch = counter.current

    # ----------------------------------------------------------- decoding
    def _load_fusion_lm(self):
        """Optional shallow-fusion LM (lm_weight > 0 + lm_path set):
        -> (lm_step_fn, lm_weight, lm_initial_state_fn) or None.
        ``*.arpa`` paths load a backoff n-gram (densified jit-safe,
        ``lm/fusion.py``); anything else is a ``tools/train_lm.py``
        RNN-LM checkpoint. Reference:
        decoders/transducer.py:311-314,386-409; lm/arpa.py."""
        weight = float(getattr(self.hparams, "lm_weight", 0.0) or 0.0)
        path = getattr(self.hparams, "lm_path", None)
        if weight <= 0 or not path:
            return None
        if str(path).endswith(".arpa"):
            from tsasr_tpu.lm import BackoffNgramLM, read_arpa
            from tsasr_tpu.lm.fusion import make_ngram_lm_step_fn
            with open(path) as f:
                _, ngrams_d, backoffs = read_arpa(f)
            ngram_lm = BackoffNgramLM(ngrams_d, backoffs)
            id2token = list(self.tokenizer.pieces)
            step_fn, initial_state_fn = make_ngram_lm_step_fn(
                ngram_lm, id2token, bos_id=self.hparams.blank_index)
            return step_fn, weight, initial_state_fn
        from tsasr_tpu.models.lm import (load_lm_checkpoint,
                                         make_lm_step_fn)
        lm, variables = load_lm_checkpoint(path)
        step_fn = make_lm_step_fn(lm, variables)

        def initial_state_fn(n):
            return lm.apply(variables, n, method=lm.initial_state)

        return step_fn, weight, initial_state_fn

    def _maybe_build_searchers(self):
        if self._greedy is None:
            self._greedy = TransducerGreedySearcher(
                self.model, self.params,
                blank_index=self.hparams.blank_index)
        if self._beam is None:
            backend = getattr(self.hparams, "beam_backend", "batched")
            fusion = self._load_fusion_lm()
            if self.hparams.beam_size <= 1:
                self._beam = self._greedy
            elif backend == "batched":
                from tsasr_tpu.decoding import BatchedBeamSearcher
                lm_kwargs = {}
                if fusion is not None:
                    lm_kwargs = {"lm_step_fn": fusion[0],
                                 "lm_weight": fusion[1],
                                 "lm_initial_state_fn": fusion[2]}
                self._beam = BatchedBeamSearcher(
                    self.model, self.params,
                    blank_index=self.hparams.blank_index,
                    beam_size=self.hparams.beam_size, nbest=1,
                    expand_beam=self.hparams.expand_beam, **lm_kwargs)
            else:
                lm_kwargs = {}
                if fusion is not None:
                    lm_kwargs = {"lm_step_fn": fusion[0],
                                 "lm_weight": fusion[1]}
                self._beam = TransducerBeamSearcher(
                    self.model, self.params,
                    blank_index=self.hparams.blank_index,
                    beam_size=self.hparams.beam_size, nbest=1,
                    **lm_kwargs,
                    state_beam=self.hparams.state_beam,
                    expand_beam=self.hparams.expand_beam)
        # multi-process eval decodes on local devices with host-gathered
        # params (Brain._get_eval_params); single-process uses live params
        self._greedy.update_params(self._get_eval_params())
        self._beam.update_params(self._get_eval_params())

    def evaluate_batch_extra(self, batch, arrays, predictions, stage):
        if getattr(self.hparams, "plot_attentions", False) or \
                getattr(self.hparams, "plot_embeddings", False):
            diag = self.collect_diagnostics(batch, arrays, stage)
            if "attentions" in diag and \
                    getattr(self.hparams, "image_folder", None):
                from tsasr_tpu.utils.visualization import plot_attention
                for j, attn in enumerate(diag["attentions"]):
                    for i, ID in enumerate(batch.id):
                        safe = ID.replace("/", "_").split(".")[0]
                        for fmt in getattr(self.hparams, "image_formats",
                                           ["jpg"]):
                            plot_attention(attn[i], os.path.join(
                                self.hparams.image_folder, safe,
                                "attention",
                                f"{safe}_attention_"
                                f"{str(j + 1).zfill(2)}.{fmt}"))
        _, enc_out, _ = predictions
        hyps = None
        if stage == Stage.VALID:
            if self._current_epoch % self.hparams.valid_search_freq == 0:
                self._maybe_build_searchers()
                hyps, _, _, _ = self._greedy(enc_out,
                                             arrays["mixed_lens"])
        elif stage == Stage.TEST:
            self._maybe_build_searchers()
            hyps, _, _, _ = self._beam(enc_out, arrays["mixed_lens"])
        if hyps is None:
            return
        n_real = len(batch)
        hyps = hyps[:n_real]
        predicted_words = self.tokenizer(hyps, task="decode_from_list")
        if stage == Stage.TEST and \
                getattr(self.hparams, "prompt_test", False) and \
                not getattr(self.hparams, "transcribe_enroll", False):
            predicted_words = self._strip_enroll_transcripts(
                batch.id, predicted_words)
        self.cer_metric.append(batch.id, predicted_words,
                               batch.target_words)
        self.wer_metric.append(batch.id, predicted_words,
                               batch.target_words)

    def _strip_enroll_transcripts(self, ids, predicted_words):
        """Prompt-test mode: remove the enrollment transcription that was
        prepended/appended to the mixture transcript
        (``train_librispeechmix_scratch.py:168-185``)."""
        out = []
        mode = getattr(self.hparams, "prompt_mode", [])
        for ID, transcription in zip(ids, predicted_words):
            enroll = self.hparams.enroll_transcriptions[ID]
            if "prepend" in mode:
                transcription = transcription[len(enroll):]
            if "append" in mode:
                transcription = transcription[
                    : len(transcription) - len(enroll)]
            out.append(transcription if transcription else [""])
        return out

    # -------------------------------------------------------------- hooks
    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        # noam stepping is handled inside the jitted optax schedule; the
        # host mirror in Brain.fit_batch keeps current_lr for logging.
        if getattr(self.hparams, "plot_grad_norm", False):
            if not hasattr(self, "grad_norm"):
                self.grad_norm = []
            self.grad_norm.append(self.last_grad_norm)

    def collect_diagnostics(self, batch, arrays, stage):
        """Attention / speaker-embedding collection for the plotting
        switches (reference ``plot_attentions`` / ``plot_embeddings``)."""
        out = {}
        if getattr(self.hparams, "plot_attentions", False):
            feats, rel = self._mixture_features(
                arrays, stage, jax.random.PRNGKey(0))
            kwargs = self._forward_kwargs(arrays)
            speaker = None
            if self.variant == "scratch":
                speaker = self.model.apply(
                    self.params, kwargs["enroll_feats"],
                    kwargs["enroll_rel_lens"],
                    method=self.model.extract_speaker)
            _, attns = self.model.apply(
                self.params, feats, rel, speaker_embs=speaker,
                method=self.model.encode_with_attn)
            out["attentions"] = [np.asarray(a) for a in attns]
        if getattr(self.hparams, "plot_embeddings", False) and \
                self.variant == "scratch":
            kwargs = self._forward_kwargs(arrays)
            embs = self.model.apply(
                self.params, kwargs["enroll_feats"],
                kwargs["enroll_rel_lens"],
                method=self.model.extract_speaker)
            if not hasattr(self, "all_speaker_embs"):
                self.all_speaker_embs = {}
            for i, ID in enumerate(batch.id):
                self.all_speaker_embs[ID] = np.asarray(embs[i, 0])
        return out

    def on_stage_start(self, stage, epoch=None):
        if epoch is not None:
            self._current_epoch = epoch
        if stage != Stage.TRAIN:
            from tsasr_tpu.utils.metric_stats import ErrorRateStats
            self.cer_metric = ErrorRateStats(split_tokens=True)
            self.wer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        stage_stats = {"loss": stage_loss}
        if stage == Stage.TRAIN:
            self.train_stats = stage_stats
            return

        searched = (stage == Stage.TEST or
                    (self._current_epoch %
                     self.hparams.valid_search_freq == 0))
        if searched and self.wer_metric.scores is not None:
            self._merge_distributed_metrics()
            if self.wer_metric.scores:
                stage_stats["CER"] = self.cer_metric.summarize("error_rate")
                stage_stats["WER"] = self.wer_metric.summarize("error_rate")

        if stage == Stage.VALID:
            lr = self.current_lr()
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": lr,
                            "steps": self.optimizer_step},
                train_stats=getattr(self, "train_stats",
                                    {"loss": float("nan")}),
                valid_stats=stage_stats)
            if searched and "WER" in stage_stats and \
                    self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"WER": stage_stats["WER"]}, min_keys=["WER"],
                    num_to_keep=self.hparams.keep_checkpoints)
        elif stage == Stage.TEST:
            self.hparams.train_logger.log_stats(
                stats_meta={"Epoch loaded": self._current_epoch},
                test_stats=stage_stats)
            if if_main_process() and hasattr(self.hparams, "wer_file"):
                with open(self.hparams.wer_file, "w") as f:
                    self.wer_metric.write_stats(f)

    def _merge_distributed_metrics(self):
        """Cross-process WER/CER merge + dedup (reference
        ``train_librispeechmix_scratch.py:217-236``)."""
        n_local = len(self.wer_metric.scores or [])
        gathered_cer = all_gather_object(self.cer_metric.scores)
        gathered_wer = all_gather_object(self.wer_metric.scores)
        self.cer_metric.scores = list(itertools.chain(*gathered_cer))
        self.wer_metric.scores = list(itertools.chain(*gathered_wer))
        self.cer_metric.scores = list(
            {x["key"]: x for x in self.cer_metric.scores}.values())
        self.wer_metric.scores = list(
            {x["key"]: x for x in self.wer_metric.scores}.values())
        if jax.process_count() > 1:
            logger.info(
                "metric merge: %d local -> %d merged utterances "
                "(process %d/%d)", n_local, len(self.wer_metric.scores),
                jax.process_index(), jax.process_count())


# ======================================================== dataio plumbing
def dataio_prepare(hparams, tokenizer, variant="scratch"):
    """Datasets + pipelines, mirroring
    ``train_librispeechmix_scratch.py:279-488``."""
    data_folder = hparams["data_folder"]
    replacements = {"DATA_ROOT": data_folder}

    train_data = DynamicItemDataset.from_json(hparams["train_json"],
                                              replacements=replacements)
    sorting = hparams.get("sorting", "ascending")
    if sorting in ("ascending", "descending"):
        train_data = train_data.filtered_sorted(
            sort_key="duration", reverse=sorting == "descending",
            key_max_value={"duration": hparams["train_remove_if_longer"]})
    elif sorting != "random":
        raise NotImplementedError(
            "`sorting` must be random, ascending or descending")

    valid_data = DynamicItemDataset.from_json(
        hparams["valid_json"], replacements=replacements).filtered_sorted(
        sort_key="duration", reverse=True,
        key_max_value={"duration": hparams["valid_remove_if_longer"]})
    test_data = DynamicItemDataset.from_json(
        hparams["test_json"], replacements=replacements).filtered_sorted(
        sort_key="duration", reverse=True,
        key_max_value={"duration": hparams["test_remove_if_longer"]})

    datasets = [train_data, valid_data, test_data]
    add_dynamic_item(datasets, make_audio_pipeline(hparams))
    add_dynamic_item(datasets, make_text_pipeline(
        tokenizer, blank_index=hparams["blank_index"]))
    output_keys = ["id", "mixed_sig", "enroll_sig", "tokens_bos",
                   "tokens", "target_words"]
    if (variant == "pretrained"
            and resolve_speaker_backend(hparams) == "torch_cache"):
        # host d-vector cache; the jax backend consumes enroll_sig
        # directly and embeds in-jit
        from tsasr_tpu.recipes.speaker_embeddings import \
            make_speaker_embedding_pipeline
        add_dynamic_item(datasets,
                         make_speaker_embedding_pipeline(hparams))
        output_keys.append("speaker_emb")
    set_output_keys(datasets, output_keys)
    return train_data, valid_data, test_data


def build_dataloader_kwargs(hparams, dataset, stage):
    """Dynamic-batching loader kwargs (reference main :576-610).

    Multi-process data discipline (differs from the reference's
    per-rank DDP sharding, ``core.py:862-865,938-944``, by design):

    - TRAIN: every process iterates the SAME sampler and builds the
      same *global* host batch; ``parallel.mesh.shard_batch`` lays it
      out over the global device mesh, transferring only each process's
      addressable shards. The 'data' mesh axis IS the data-parallel
      sharding — splitting the sampler too would double-shard. SPMD
      also requires every process to dispatch the identical program
      (same global shapes every step), which per-rank dynamic batching
      cannot guarantee without a per-step shape sync.
    - VALID/TEST: decoding is embarrassingly parallel, so each process
      evaluates a disjoint sampler shard on its LOCAL devices
      (``DistributedSamplerWrapper``) and WER/CER merge + dedup via
      ``all_gather_object`` (the reference recipe's
      ``train_librispeechmix_scratch.py:217-236``).
    """
    worker_mode = hparams.get("dataloader_worker_mode", "thread")
    workers = hparams.get("dataloader_workers", 0)
    if worker_mode == "thread":
        # >1 prefetch thread only adds GIL contention (measured:
        # reports/probe_workers_sweep_r4.jsonl); real core scaling
        # needs worker_mode: process
        workers = min(workers, 1)
    kwargs = {"num_workers": workers, "worker_mode": worker_mode,
              # forkserver spawns workers from a clean exec'd daemon:
              # required when process workers run inside a
              # jax.distributed fit — a plain fork from the
              # gloo-threaded trainer kills the coordination client
              # (measured r5: GetKeyValue DEADLINE_EXCEEDED in the
              # 2-process proof; reports/multiprocess_r5)
              "mp_context": hparams.get("dataloader_mp_context", "fork"),
              "pad_to_multiple": hparams.get("pad_to_multiple")}
    if hparams.get("dynamic_batching", True):
        sampler = DynamicBatchSampler(
            dataset, hparams[f"{stage}_max_batch_length"],
            num_buckets=hparams["num_buckets"],
            length_func=lambda x: x["duration"],
            shuffle=False,
            batch_ordering=(hparams.get("sorting", "ascending")
                            if stage == "train" else "descending"),
            max_batch_ex=hparams["max_batch_size"])
        import jax
        if jax.process_count() > 1 and stage != "train":
            from tsasr_tpu.data import DistributedSamplerWrapper
            sampler = DistributedSamplerWrapper(
                sampler, rank=jax.process_index(),
                world_size=jax.process_count())
        kwargs["batch_sampler"] = sampler
    else:
        bs = hparams[f"{stage}_batch_size"]
        import jax
        if jax.process_count() > 1 and stage != "train":
            # static batching must shard eval across processes too —
            # without this each process decodes the FULL eval set and
            # only the merge-time dedup hides it (found by the r5
            # multi-process proof's eval_sharded_and_merged check when
            # it switched to --dynamic_batching False)
            from tsasr_tpu.data import DistributedSamplerWrapper
            n = len(dataset)
            batches = [list(range(i, min(i + bs, n)))
                       for i in range(0, n, bs)]
            kwargs["batch_sampler"] = DistributedSamplerWrapper(
                batches, rank=jax.process_index(),
                world_size=jax.process_count())
        else:
            kwargs["batch_size"] = bs
    return kwargs


def run_experiment(variant, argv=None):
    """Full experiment main for one variant (the reference's
    ``__main__`` block, ``train_librispeechmix_scratch.py:491-687``)."""
    from tsasr_tpu.training.experiment import (
        create_experiment_directory,
        parse_arguments,
    )
    from tsasr_tpu.utils.hparams import load_hyperpyyaml

    hparams_file, run_opts, overrides = parse_arguments(argv)
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)

    create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file, overrides=overrides)

    run_on_main(prepare_librispeechmix, kwargs={
        "data_folder": hparams["data_folder"],
        "save_folder": hparams["save_folder"],
        "splits": hparams["splits"],
        "num_targets": hparams.get("num_targets"),
        "num_enrolls": hparams.get("num_enrolls"),
        "trim_nontarget": hparams.get("trim_nontarget"),
        "suppress_delay": hparams.get("suppress_delay"),
        "overlap_ratio": hparams.get("overlap_ratio"),
    })

    # Fit the tokenizer on train+valid+test transcripts (reference
    # :526-556: token distributions may differ across splits).
    texts = []
    for split in ("train", "valid", "test"):
        with open(hparams[f"{split}_json"], encoding="utf-8") as f:
            texts.extend(e["wrd"] for e in json.load(f).values())
    tokenizer_kwargs = dict(
        vocab_size=hparams["vocab_size"],
        model_type=hparams.get("token_type", "char"),
        character_coverage=hparams.get("character_coverage", 1.0),
        unk_id=hparams["blank_index"])
    # main trains + saves; after the barrier everyone (re)loads the
    # cached model — the reference wrapper's train-on-main contract
    # (SentencePiece.py:279-393)
    run_on_main(train_tokenizer, args=(hparams["save_folder"], texts),
                kwargs=tokenizer_kwargs)
    tokenizer = train_tokenizer(hparams["save_folder"], texts,
                                **tokenizer_kwargs)

    train_data, valid_data, test_data = dataio_prepare(
        hparams, tokenizer, variant)

    # Warm start (reference Pretrainer, yaml:317-324)
    if hparams.get("model_path"):
        from tsasr_tpu.utils.parameter_transfer import Pretrainer
        pretrainer = Pretrainer(collect_in=hparams["save_folder"],
                                paths={"model": hparams["model_path"]})
        run_on_main(pretrainer.collect_files)
    else:
        pretrainer = None

    # bf16 compute: rebuild the model with a bfloat16 dtype (params and
    # the optimizer stay f32; the reference's autocast equivalent)
    precision = run_opts.get("precision", hparams.get("precision"))
    if precision == "bf16" and "model_config" in hparams:
        import dataclasses
        from tsasr_tpu.models.transducer import TSTransducer
        cfg16 = dataclasses.replace(hparams["model_config"],
                                    dtype=jnp.bfloat16)
        hparams["model"] = TSTransducer(cfg16)

    mesh = _make_mesh_from_opts(run_opts)
    if mesh is not None and "seq" in mesh.axis_names:
        # seq parallelism shards post-frontend frames: bump the MXU
        # frame-alignment pad so the encoder frame count divides the
        # 'seq' axis (frontend subsamples by the stride product)
        import math
        cfg = hparams.get("model_config")
        stride = int(np.prod(cfg.frontend_strides)) if cfg is not None \
            else 4
        need = stride * int(mesh.shape["seq"])
        hparams["pad_feats_to"] = math.lcm(
            int(hparams.get("pad_feats_to") or 1), need)
    brain = TSASRBrain(
        modules={"model": hparams["model"]},
        opt_class=hparams["opt_class"], hparams=hparams,
        run_opts=run_opts, checkpointer=hparams.get("checkpointer"),
        mesh=mesh, variant=variant, tokenizer=tokenizer)
    if pretrainer is not None:
        brain._pretrainer = pretrainer

    if run_opts.get("profile"):
        from tsasr_tpu.utils.profiling import Profiler, profile
        profile(brain, Profiler(
            run_opts.get("profile_dir")
            or os.path.join(hparams["output_folder"], "profiler")))

    train_kwargs = build_dataloader_kwargs(hparams, train_data, "train")
    valid_kwargs = build_dataloader_kwargs(hparams, valid_data, "valid")

    brain.fit(hparams["epoch_counter"], train_data, valid_data,
              train_loader_kwargs=train_kwargs,
              valid_loader_kwargs=valid_kwargs)

    if hparams.get("plot_grad_norm") and getattr(brain, "grad_norm", None):
        from tsasr_tpu.utils.visualization import plot_grad_norm
        for fmt in hparams.get("image_formats", ["jpg"]):
            plot_grad_norm(brain.grad_norm, os.path.join(
                hparams.get("image_folder", hparams["output_folder"]),
                f"grad_norm.{fmt}"))

    for split in hparams["test_splits"]:
        run_on_main(prepare_librispeechmix, kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "splits": [split],
            "num_targets": hparams.get("num_targets"),
            "num_enrolls": hparams.get("num_enrolls"),
            "trim_nontarget": hparams.get("trim_nontarget"),
            "suppress_delay": hparams.get("suppress_delay"),
            "overlap_ratio": hparams.get("overlap_ratio"),
        })
        _, _, test_data = dataio_prepare(hparams, tokenizer, variant)
        test_kwargs = build_dataloader_kwargs(hparams, test_data, "test")
        brain.hparams.wer_file = os.path.join(
            hparams["output_folder"], f"wer_{split}.txt")

        if hparams.get("prompt_test"):
            # two-pass: transcribe enrollments first, then mixtures with
            # enrollment-transcript stripping (reference :660-687)
            brain.hparams.transcribe_enroll = True
            hparams["transcribe_enroll"] = True
            original_wer_file = brain.hparams.wer_file
            brain.hparams.wer_file = os.path.join(
                os.path.dirname(original_wer_file), "wer_enrollments.txt")
            brain.evaluate(test_data, min_key="WER",
                           test_loader_kwargs=test_kwargs)
            brain.hparams.enroll_transcriptions = {
                x["key"]: x["hyp_tokens"]
                for x in brain.wer_metric.scores}
            brain.hparams.transcribe_enroll = False
            hparams["transcribe_enroll"] = False
            brain.hparams.wer_file = original_wer_file
            _, _, test_data = dataio_prepare(hparams, tokenizer, variant)

        brain.evaluate(test_data, min_key="WER",
                       test_loader_kwargs=test_kwargs)

    if hparams.get("plot_embeddings") and \
            getattr(brain, "all_speaker_embs", None):
        from tsasr_tpu.utils.visualization import plot_embeddings
        folder = hparams.get("image_folder", hparams["output_folder"])
        for fmt in hparams.get("image_formats", ["jpg"]):
            plot_embeddings(
                list(brain.all_speaker_embs.values()),
                [str(k).split("/")[-3] if "/" in str(k) else str(k)
                 for k in brain.all_speaker_embs],
                os.path.join(folder, f"embeddings.{fmt}"),
                title=f"Speaker embeddings ({variant})",
                perplexity=min(len(brain.all_speaker_embs) - 1, 30))
    return brain


def _make_mesh_from_opts(run_opts):
    import jax
    from tsasr_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    tp = run_opts.get("tensor_parallel_count") or 1
    sp = run_opts.get("sequence_parallel_count") or 1
    pp = run_opts.get("pipeline_parallel_count") or 1
    dp = run_opts.get("data_parallel_count")
    if dp is None and tp == sp == pp == 1 and n == 1:
        return None
    return make_mesh(dp=dp, tp=tp, sp=sp, pp=pp)
