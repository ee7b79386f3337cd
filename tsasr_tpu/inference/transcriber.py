"""Offline transcription interface.

The user-facing inference surface (the reference exposes inference
through ``pretrained/interfaces.py``-style wrappers; here a compact
equivalent for the TS-ASR task): load a trained experiment (checkpoint +
tokenizer + model config), then ``transcribe(mixture_wav, enroll_wav)``.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp


class TSASRTranscriber:
    """Batch (offline) target-speaker transcription."""

    def __init__(self, model, params, tokenizer, sample_rate=16000,
                 n_fft=512, n_mels=80, win_length=32.0, blank_index=0,
                 beam_size=1, variant="scratch", lm_path=None,
                 lm_weight=0.0):
        from tsasr_tpu.ops import Fbank
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.blank_index = blank_index
        self.variant = variant
        self.fbank = Fbank(sample_rate=sample_rate, n_fft=n_fft,
                           n_mels=n_mels, win_length=win_length)
        lm_kwargs = {}
        if lm_path and lm_weight > 0:
            # RNN-LM shallow fusion at inference (tools/train_lm.py ckpt)
            import flax.serialization
            from tsasr_tpu.models.lm import (RNNLM, RNNLMConfig,
                                             make_lm_step_fn)
            with open(lm_path, "rb") as f:
                payload = flax.serialization.msgpack_restore(f.read())
            cfg = RNNLMConfig(**{k: type(getattr(RNNLMConfig, k, 0))(v)
                                 if not isinstance(v, dict) else v
                                 for k, v in payload.get("config",
                                                         {}).items()})                 if payload.get("config") else RNNLMConfig()
            lm = RNNLM(cfg)
            variables = {"params": payload.get("params", payload)}
            lm_kwargs = {
                "lm_step_fn": make_lm_step_fn(lm, variables),
                "lm_weight": float(lm_weight),
                "lm_initial_state_fn": lambda n: lm.apply(
                    variables, n, method=lm.initial_state)}
        if beam_size <= 1:
            from tsasr_tpu.decoding import TransducerGreedySearcher
            self.searcher = TransducerGreedySearcher(model, params,
                                                     blank_index)
        else:
            from tsasr_tpu.decoding import BatchedBeamSearcher
            self.searcher = BatchedBeamSearcher(model, params,
                                                blank_index,
                                                beam_size=beam_size,
                                                **lm_kwargs)
        self._encode = jax.jit(self._encode_impl)

    # ------------------------------------------------------------ loading
    @classmethod
    def from_experiment(cls, experiment_dir, beam_size=1,
                        min_key="WER", lm_path=None, lm_weight=None):
        """Load the best checkpoint + tokenizer from an experiment dir
        produced by the training entry points. LM fusion defaults to the
        experiment's lm_path/lm_weight hparams when not overridden."""
        from tsasr_tpu.data.tokenizer import CharTokenizer, load_tokenizer
        from tsasr_tpu.training.checkpoints import Checkpointer
        from tsasr_tpu.utils.hparams import load_hyperpyyaml

        hp_path = os.path.join(experiment_dir, "hyperparams.yaml")
        with open(hp_path) as f:
            hparams = load_hyperpyyaml(f, overrides={
                "data_folder": "/nonexistent"},
                overrides_must_match=False)
        model = hparams["model"]
        save_folder = hparams["save_folder"]
        token_type = hparams.get("token_type", "char")
        tok_path = os.path.join(
            save_folder, f"{token_type}_{hparams['vocab_size']}.json")
        tokenizer = load_tokenizer(tok_path) if os.path.exists(tok_path) \
            else CharTokenizer.load(os.path.join(
                save_folder, f"char_{hparams['vocab_size']}.json"))

        # initialize params with dummy shapes, then restore
        from tsasr_tpu.recipes.librispeechmix import TSASRBrain
        variant = "scratch" if hparams["model_config"].use_speaker_encoder \
            else ("pretrained"
                  if hparams["model_config"].speaker_embedding_dim
                  else "none")
        brain = TSASRBrain(modules={"model": model}, hparams=hparams,
                           run_opts={"noprogressbar": True},
                           variant=variant, tokenizer=tokenizer)
        brain._ensure_initialized()
        ckpt = Checkpointer(save_folder, {"brain": _ParamsOnly(brain)},
                            allow_partial_load=True)
        ckpt.recover_if_possible(min_key=min_key)
        if lm_path is None:
            lm_path = hparams.get("lm_path")
        if lm_weight is None:
            lm_weight = float(hparams.get("lm_weight", 0.0) or 0.0)
        return cls(model, brain.params, tokenizer,
                   sample_rate=hparams["sample_rate"],
                   n_fft=hparams["n_fft"], n_mels=hparams["n_mels"],
                   win_length=float(hparams["win_length"]),
                   blank_index=hparams["blank_index"],
                   beam_size=beam_size, variant=variant,
                   lm_path=lm_path, lm_weight=lm_weight)

    # ---------------------------------------------------------- inference
    def _encode_impl(self, params, wav, rel, enroll, enroll_rel):
        from tsasr_tpu.ops import input_normalization
        feats = input_normalization(self.fbank(wav), rel)
        speaker = None
        if enroll is not None and self.variant == "scratch":
            efeats = input_normalization(self.fbank(enroll), enroll_rel)
            speaker = self.model.apply(params, efeats, enroll_rel,
                                       method=self.model.extract_speaker)
        return self.model.apply(params, feats, rel, speaker, enroll_rel,
                                method=self.model.encode)

    def transcribe_batch(self, wavs, enrolls=None):
        """wavs: list of 1-D float arrays -> list of transcripts."""
        B = len(wavs)
        max_len = max(len(w) for w in wavs)
        batch = np.zeros((B, max_len), np.float32)
        rel = np.zeros(B, np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
            rel[i] = len(w) / max_len
        enroll_b = enroll_rel = None
        if enrolls is not None:
            emax = max(len(e) for e in enrolls)
            enroll_b = np.zeros((B, emax), np.float32)
            enroll_rel = np.zeros(B, np.float32)
            for i, e in enumerate(enrolls):
                enroll_b[i, : len(e)] = e
                enroll_rel[i] = len(e) / emax
            enroll_b = jnp.asarray(enroll_b)
            enroll_rel = jnp.asarray(enroll_rel)
        enc = self._encode(self.params, jnp.asarray(batch),
                           jnp.asarray(rel), enroll_b, enroll_rel)
        hyps, _, _, _ = self.searcher(enc, jnp.asarray(rel))
        return [" ".join(self.tokenizer.decode_ids_to_words(h))
                for h in hyps]

    def transcribe(self, wav, enroll=None):
        return self.transcribe_batch(
            [wav], [enroll] if enroll is not None else None)[0]

    def streaming(self, mode="kv_cache", **kwargs):
        """A StreamingTranscriber sharing this model/params/tokenizer
        (causal models; see tsasr_tpu.inference.streaming)."""
        from tsasr_tpu.inference.streaming import StreamingTranscriber
        return StreamingTranscriber(
            self.model, self.params, self.tokenizer,
            sample_rate=self.sample_rate, blank_index=self.blank_index,
            mode=mode, **kwargs)

    def transcribe_file(self, path, enroll_path=None):
        from tsasr_tpu.data.audio import read_audio, resample
        wav, sr = read_audio(path)
        wav = resample(wav, sr, self.sample_rate)
        enroll = None
        if enroll_path:
            e, esr = read_audio(enroll_path)
            enroll = resample(e, esr, self.sample_rate)
        return self.transcribe(wav, enroll)


class _ParamsOnly:
    """Checkpoint adapter restoring only the params from a brain ckpt."""

    def __init__(self, brain):
        self.brain = brain

    def save(self, path):
        raise NotImplementedError("inference adapter is load-only")

    def load(self, path, end_of_epoch=True):
        from flax import serialization
        with open(path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        self.brain.params = serialization.from_state_dict(
            self.brain.params, restored["params"])
