"""Transducer model assembly: TS-Conformer encoder + LSTM predictor + joint.

TPU-native equivalent of the reference recipe's module graph
(``hparams/LibriSpeechMix/conformer-t_scratch.yaml:122-251`` and the
forward pass in ``train_librispeechmix_scratch.py:34-135``):

    mixture feats -> ConvFrontEnd -> TSConformer(12L, +inject) -> enc_proj
    enroll feats  -> ConvFrontEnd -> TSConformer(6L) -> masked mean-pool
                  -> speaker_proj
    tokens_bos    -> one-hot Embedding(V -> V-1) -> LSTM -> dec_proj
    logits = head(leaky_relu(enc[:,T,1,:] + dec[:,1,U,:]))

Components mirrored:
- one-hot Embedding with zeroed blank row
  (``nnet/embedding.py:14-114``);
- ``Transducer_joint`` sum/concat + nonlinearity
  (``nnet/transducer/transducer_joint.py:14-95``);
- masked ceil-length time pooling of the speaker encoding
  (``train_librispeechmix_scratch.py:54-64``).
"""

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.conformer import TSConformerEncoder
from tsasr_tpu.models.frontend import ConvolutionFrontEnd
from tsasr_tpu.models.rnn import LSTM
from tsasr_tpu.ops.masks import length_to_mask

Dtype = Any
xavier_normal = nn.initializers.xavier_normal


@dataclass(frozen=True)
class TSTransducerConfig:
    """Model hyperparameters; keys mirror the reference YAML."""

    vocab_size: int = 29
    blank_index: int = 0
    n_mels: int = 80
    d_model: int = 256
    nhead: int = 4
    encoder_num_layers: int = 12
    d_ffn: int = 2048
    kernel_size: int = 31
    dropout: float = 0.1
    # random-bit width per dropout mask element: 32 = exact nn.Dropout
    # (bernoulli); 8/16 draw narrower bits (keep-prob quantized to
    # 1/2**bits) — measurably cheaper on TPU (reports/perf_r3.md)
    dropout_bits: int = 32
    causal_encoder: bool = False
    att_context_size: int = 0   # >0: bounded left attention context
    frontend_causal: bool = False
    frontend_channels: Sequence[int] = (128, 128)
    frontend_strides: Sequence[int] = (2, 2)
    injection_mode: Optional[str] = "cat"
    injection_after: Union[int, Sequence[int]] = 0
    use_speaker_encoder: bool = True
    speaker_encoder_type: str = "conformer"   # "conformer" | "ecapa"
    speaker_encoder_layers: int = 6
    ecapa_channels: Sequence[int] = (512, 512, 512, 512, 1536)
    ecapa_lin_neurons: int = 192
    speaker_embedding_dim: Optional[int] = None  # external d-vectors (wavlm)
    decoder_neurons: int = 512
    decoder_num_layers: int = 1
    joint_dim: int = 640
    joint_mode: str = "sum"
    remat: bool = False
    remat_policy: str = "full"   # "full" | "dots" (see TSConformerEncoder)
    fused_attention: bool = False  # Pallas attention kernel (TPU)
    # YAML-swappable component classes (models/registry.py): a registry
    # name or dotted import path; None = the built-in. The replacement
    # must accept the same constructor kwargs + call signature as the
    # built-in it replaces (the reference swaps modules via per-module
    # !new: blocks, conformer-t_scratch.yaml:122-251).
    frontend_class: Optional[str] = None
    encoder_class: Optional[str] = None
    predictor_class: Optional[str] = None
    joiner_class: Optional[str] = None
    dtype: Any = jnp.float32


class OneHotEmbedding(nn.Module):
    """Fixed one-hot embedding: vocab V -> V-1 dims, blank row all-zero.

    Matches the reference ``Embedding(consider_as_one_hot=True)``:
    non-blank token i maps to unit vector at position (i-1 if i > blank
    else i); the blank/BOS token maps to the zero vector.
    """

    num_embeddings: int
    blank_id: int = 0
    dtype: Dtype = jnp.float32

    def __call__(self, tokens):
        V = self.num_embeddings
        eye = jnp.eye(V - 1, dtype=self.dtype)
        rows = []
        for i in range(V):
            if i == self.blank_id:
                rows.append(jnp.zeros((V - 1,), self.dtype))
            elif i < self.blank_id:
                rows.append(eye[i])
            else:
                rows.append(eye[i - 1])
        table = jnp.stack(rows)
        return table[tokens]


class Predictor(nn.Module):
    """Prediction network: one-hot embed -> LSTM -> joint projection."""

    vocab_size: int
    blank_index: int = 0
    hidden_size: int = 512
    num_layers: int = 1
    joint_dim: int = 640
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = OneHotEmbedding(self.vocab_size, self.blank_index,
                                         dtype=self.dtype)
        self.decoder = LSTM(hidden_size=self.hidden_size,
                            in_features=self.vocab_size - 1,
                            num_layers=self.num_layers, dtype=self.dtype)
        self.decoder_proj = nn.Dense(self.joint_dim, dtype=self.dtype,
                                     name="decoder_proj")

    def __call__(self, tokens_bos, initial_state=None):
        embs = self.embedding(tokens_bos)
        dec_out, state = self.decoder(embs, initial_state)
        return self.decoder_proj(dec_out), state

    def step(self, token, state):
        """One decode step: token (B,) int -> (dec_proj (B, J), state)."""
        emb = self.embedding(token)
        out, state = self.decoder.step(emb, state)
        return self.decoder_proj(out), state

    def initial_state(self, batch_size):
        return self.decoder.initial_state(batch_size, dtype=self.dtype)


class Joiner(nn.Module):
    """Transducer joint: broadcast sum (or concat+Dense) + nonlinearity."""

    joint_dim: int = 640
    mode: str = "sum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, dec):
        """enc (..., 1, J) + dec (..., U, J) broadcast-joined."""
        if self.mode == "sum":
            joint = enc + dec
        elif self.mode == "concat":
            shape = jnp.broadcast_shapes(enc.shape[:-1], dec.shape[:-1])
            enc_b = jnp.broadcast_to(enc, shape + enc.shape[-1:])
            dec_b = jnp.broadcast_to(dec, shape + dec.shape[-1:])
            joint = jnp.concatenate([enc_b, dec_b], axis=-1)
            joint = nn.Dense(self.joint_dim, dtype=self.dtype,
                             name="joint_network")(joint)
        else:
            raise ValueError(f"joint mode {self.mode}")
        return jax.nn.leaky_relu(joint)


class TSTransducer(nn.Module):
    """Full TS-ASR transducer (flagship model).

    Public methods (all usable through ``Module.apply(..., method=...)``):
    - ``__call__``: training forward -> logits (B, T', U+1, V)
    - ``encode``: mixture features -> projected encoder output
    - ``extract_speaker``: enrollment features -> speaker embedding
    - ``predict`` / ``predict_step``: prediction network
    - ``joint_logits``: joint + head on arbitrary enc/dec slices
    """

    config: TSTransducerConfig = field(default_factory=TSTransducerConfig)

    def setup(self):
        from tsasr_tpu.models.registry import resolve
        c = self.config
        frontend_cls = resolve("frontend", c.frontend_class) \
            or ConvolutionFrontEnd
        encoder_cls = resolve("encoder", c.encoder_class) \
            or TSConformerEncoder
        predictor_cls = resolve("predictor", c.predictor_class) or Predictor
        joiner_cls = resolve("joiner", c.joiner_class) or Joiner
        self.frontend = frontend_cls(
            out_channels=tuple(c.frontend_channels),
            strides=tuple(c.frontend_strides), dropout=c.dropout,
            dropout_bits=c.dropout_bits,
            causal=c.frontend_causal, dtype=c.dtype)
        self.encoder = encoder_cls(
            d_model=c.d_model, nhead=c.nhead,
            num_layers=c.encoder_num_layers, d_ffn=c.d_ffn,
            kernel_size=c.kernel_size, dropout=c.dropout,
            dropout_bits=c.dropout_bits, causal=c.causal_encoder,
            att_context_size=c.att_context_size,
            injection_mode=c.injection_mode,
            injection_after=(tuple(c.injection_after)
                             if isinstance(c.injection_after, (list, tuple))
                             else (c.injection_after,)),
            remat=c.remat, remat_policy=c.remat_policy,
            fused_attention=c.fused_attention, dtype=c.dtype)
        self.encoder_proj = nn.Dense(c.joint_dim, dtype=c.dtype,
                                     name="encoder_proj")
        self.predictor = predictor_cls(
            vocab_size=c.vocab_size, blank_index=c.blank_index,
            hidden_size=c.decoder_neurons, num_layers=c.decoder_num_layers,
            joint_dim=c.joint_dim, dtype=c.dtype)
        self.joiner = joiner_cls(joint_dim=c.joint_dim, mode=c.joint_mode,
                                 dtype=c.dtype)
        self.head = nn.Dense(c.vocab_size, dtype=c.dtype,
                             name="transducer_head")

        if c.use_speaker_encoder and c.injection_mode is not None:
            if c.speaker_encoder_type == "ecapa":
                # beyond-parity option: ECAPA-TDNN speaker branch
                # (pooled embedding only; cross_attention needs frames)
                if c.injection_mode == "cross_attention":
                    raise ValueError(
                        "speaker_encoder_type='ecapa' pools over time; "
                        "use the conformer branch for cross_attention")
                from tsasr_tpu.models.ecapa import ECAPA_TDNN, ECAPAConfig
                self.speaker_encoder = ECAPA_TDNN(ECAPAConfig(
                    input_size=c.n_mels,
                    channels=tuple(c.ecapa_channels),
                    lin_neurons=c.ecapa_lin_neurons, dtype=c.dtype))
            else:
                self.speaker_frontend = ConvolutionFrontEnd(
                    out_channels=tuple(c.frontend_channels),
                    strides=tuple(c.frontend_strides), dropout=c.dropout,
                    dropout_bits=c.dropout_bits,
                    causal=False, dtype=c.dtype)
                self.speaker_encoder = TSConformerEncoder(
                    d_model=c.d_model, nhead=c.nhead,
                    num_layers=c.speaker_encoder_layers, d_ffn=c.d_ffn,
                    kernel_size=c.kernel_size, dropout=c.dropout,
                    dropout_bits=c.dropout_bits,
                    causal=False, injection_mode=None, remat=c.remat,
                    remat_policy=c.remat_policy,
                    fused_attention=c.fused_attention, dtype=c.dtype)
        if c.injection_mode is not None:
            # speaker_proj maps (own encoder d_model | external dim)
            self.speaker_proj = nn.Dense(c.d_model, dtype=c.dtype,
                                         name="speaker_proj")

    # ----------------------------------------------------------- speaker
    def extract_speaker(self, enroll_feats, enroll_rel_lens,
                        deterministic=True):
        """Enrollment features -> projected speaker embedding (B, 1, D)
        (or (B, S, D) for cross_attention mode, unpooled)."""
        c = self.config
        if c.speaker_encoder_type == "ecapa":
            # BN runs on running stats even in training (frozen-BN
            # convention) so the jitted train step stays immutable
            x = self.speaker_encoder(enroll_feats, enroll_rel_lens,
                                     train=False)
            return self.speaker_proj(x)          # (B, 1, E) pooled
        x = self.speaker_frontend(enroll_feats, deterministic=deterministic)
        x = self.speaker_encoder(x, enroll_rel_lens,
                                 deterministic=deterministic)
        if c.injection_mode != "cross_attention":
            x = self.pool_speaker(x, enroll_rel_lens)
        return self.speaker_proj(x)

    def project_external_speaker(self, speaker_embs):
        """External (e.g. WavLM d-vector) embedding -> model space."""
        return self.speaker_proj(speaker_embs)

    @staticmethod
    def pool_speaker(x, rel_lens):
        """Masked mean over time with ceil lengths
        (``train_librispeechmix_scratch.py:54-64``)."""
        S = x.shape[-2]
        abs_len = jnp.minimum(jnp.ceil(rel_lens * S), S).astype(jnp.int32)
        mask = length_to_mask(abs_len, S)[..., None].astype(x.dtype)
        summed = jnp.sum(x * mask, axis=-2, keepdims=True)
        return summed / jnp.sum(mask, axis=-2, keepdims=True)

    # ----------------------------------------------------------- encoder
    def encode(self, feats, rel_lens, speaker_embs=None,
               speaker_rel_lens=None, deterministic=True):
        """Mixture features (B, T, n_mels) -> (B, T', joint_dim)."""
        x = self.frontend(feats, deterministic=deterministic)
        x = self.encoder(x, rel_lens, speaker_embs=speaker_embs,
                         speaker_embs_length=speaker_rel_lens,
                         deterministic=deterministic)
        return self.encoder_proj(x)

    def encode_stream(self, feats_new, stream_state, speaker_embs=None,
                      speaker_rel_lens=None):
        """Constant-time streaming encode (causal models): process only
        the NEW feature frames against cached frontend rows and per-layer
        attention K/V + conv states. Returns (enc_proj_new, new_state).

        ``feats_new`` length must be divisible by the frontend stride
        product (4 for the recipe config).
        """
        x, frontend_caches = self.frontend(
            feats_new, deterministic=True,
            stream_caches=stream_state["frontend"])
        x, encoder_states = self.encoder(
            x, speaker_embs=speaker_embs,
            speaker_embs_length=speaker_rel_lens, deterministic=True,
            stream_states=stream_state["encoder"])
        new_state = {"frontend": frontend_caches,
                     "encoder": encoder_states}
        return self.encoder_proj(x), new_state

    def init_stream_state(self, batch_size, capacity):
        """Zero streaming state; ``capacity`` = max encoder frames kept
        in the attention K/V buffers."""
        c = self.config
        B = batch_size
        n_mels = c.n_mels
        frontend = []
        freq = n_mels
        ch = 1
        for k, s, out_ch in zip((3, 3), tuple(c.frontend_strides),
                                tuple(c.frontend_channels)):
            frontend.append(jnp.zeros((B, k - 1, freq, ch), c.dtype))
            freq = -(-freq // s)
            ch = out_ch
        H = c.nhead
        Dh = c.d_model // H
        encoder = []
        for _ in range(c.encoder_num_layers):
            encoder.append({
                "attn": {
                    "k": jnp.zeros((B, capacity, H, Dh), c.dtype),
                    "v": jnp.zeros((B, capacity, H, Dh), c.dtype),
                    "count": jnp.zeros((B,), jnp.int32),
                },
                "conv": jnp.zeros((B, c.kernel_size - 1, c.d_model),
                                  c.dtype),
            })
        return {"frontend": frontend, "encoder": encoder}

    def encode_with_attn(self, feats, rel_lens, speaker_embs=None,
                         speaker_rel_lens=None):
        """Like ``encode`` but also returns per-layer attention maps
        (the recipe's ``plot_attentions`` path,
        ``train_librispeechmix_scratch.py:100-119``)."""
        x = self.frontend(feats, deterministic=True)
        x, attns = self.encoder(
            x, rel_lens, speaker_embs=speaker_embs,
            speaker_embs_length=speaker_rel_lens, deterministic=True,
            return_attn=True)
        return self.encoder_proj(x), attns

    def encode_seq_parallel(self, feats, rel_lens, mesh,
                            speaker_embs=None, speaker_rel_lens=None,
                            deterministic=True, halo=None, rngs=None):
        """``encode`` with the Conformer's TIME axis sharded over
        ``mesh``'s ``'seq'`` axis (``parallel/seq_parallel.py``: per-layer
        halo exchange; causal banded encoders only). The frontend runs
        data-parallel — its activations subsample 4x and are not the
        long-form memory bottleneck. Post-frontend frame count must
        divide the seq axis — the recipe guarantees this by bumping
        ``pad_feats_to`` (``recipes/librispeechmix.py``); standalone
        callers get ``sp_encoder_apply``'s divisibility error. ``rngs``
        ({'dropout': key}) is folded per shard for train-mode dropout;
        the flax rng context is not used on the sequence-sharded section.
        """
        from tsasr_tpu.parallel.seq_parallel import sp_encoder_apply
        x = self.frontend(feats, deterministic=deterministic)
        x = sp_encoder_apply(
            self.encoder, self.encoder.variables, x, rel_lens, mesh,
            speaker_embs=speaker_embs,
            speaker_embs_length=speaker_rel_lens,
            deterministic=deterministic, halo=halo, rngs=rngs)
        return self.encoder_proj(x)

    def encode_pipeline(self, feats, rel_lens, mesh,
                        speaker_embs=None, speaker_rel_lens=None,
                        deterministic=True, n_micro=None, rngs=None):
        """``encode`` with the Conformer's LAYER axis sharded over
        ``mesh``'s ``'pipe'`` axis (``parallel/pp_parallel.py``: GPipe
        microbatch schedule, activation blocks streamed stage-to-stage
        over ppermute). The frontend runs data-parallel — it is a single
        shallow stage, not worth a pipeline slot. ``num_layers`` must be
        divisible by the pipe axis; the per-data-shard batch must be
        divisible by ``n_micro`` (default: pipe axis size).
        """
        from tsasr_tpu.parallel.pp_parallel import pp_encoder_apply
        x = self.frontend(feats, deterministic=deterministic)
        x = pp_encoder_apply(
            self.encoder, self.encoder.variables, x, rel_lens, mesh,
            speaker_embs=speaker_embs,
            speaker_embs_length=speaker_rel_lens,
            deterministic=deterministic, n_micro=n_micro, rngs=rngs)
        return self.encoder_proj(x)

    # --------------------------------------------------------- predictor
    def predict(self, tokens_bos, initial_state=None):
        return self.predictor(tokens_bos, initial_state)

    def predict_step(self, token, state):
        return self.predictor.step(token, state)

    def predictor_initial_state(self, batch_size):
        return self.predictor.initial_state(batch_size)

    # -------------------------------------------------------------- joint
    def joint_logits(self, enc, dec):
        """enc (..., 1, J), dec (..., U, J) -> logits (..., U, V)."""
        return self.head(self.joiner(enc, dec))

    def joint_logits_banded(self, enc_out, dec_out, centers, band_width):
        """Joint + head evaluated only on a diagonal band of label
        positions: (B, T, W, V) instead of (B, T, U+1, V).

        ``centers`` (B, T) int32 band starts (``ops.rnnt_loss_banded.
        band_centers``); the (B, T, U+1, joint_dim) activations — the
        reference recipe's memory peak for 60 s utterances — are never
        materialized.
        """
        B, U1, J = dec_out.shape
        idx = jnp.clip(
            centers[:, :, None] + jnp.arange(band_width)[None, None, :],
            0, U1 - 1)                                      # (B, T, W)
        dec_band = jnp.take_along_axis(
            dec_out[:, None, :, :], idx[..., None], axis=2)  # (B,T,W,J)
        return self.joint_logits(enc_out[:, :, None, :], dec_band)

    # ----------------------------------------------------------- training
    def encode_predict(self, feats, rel_lens, tokens_bos,
                       enroll_feats=None, enroll_rel_lens=None,
                       external_speaker_embs=None, deterministic=True,
                       mesh=None):
        """Forward pass up to (excluding) joint+head: returns
        (enc_out (B, T', J), dec_out (B, U+1, J)).

        The fused-loss train path (``ops.rnnt_loss_fused``) consumes
        these plus the ``transducer_head`` parameters directly, so the
        (B, T', U+1, J) joint activations never materialize in HBM.

        ``mesh`` routes the encoder through a parallel variant when the
        mesh carries the matching axis: ``'seq'`` ->
        ``encode_seq_parallel`` (time-sharded, causal banded configs),
        ``'pipe'`` -> ``encode_pipeline`` (layer-sharded GPipe). This is
        how the trainer's ``--sequence_parallel_count`` /
        ``--pipeline_parallel_count`` run-opts reach the jitted step —
        the reference keeps its (one) parallelism inside the trainer too
        (``core.py:1464-1490``).
        """
        c = self.config
        speaker_embs = None
        speaker_rel = None
        if c.injection_mode is not None:
            if external_speaker_embs is not None:
                speaker_embs = self.project_external_speaker(
                    external_speaker_embs)
                speaker_rel = enroll_rel_lens
            elif enroll_feats is not None:
                speaker_embs = self.extract_speaker(
                    enroll_feats, enroll_rel_lens,
                    deterministic=deterministic)
                speaker_rel = enroll_rel_lens

        if mesh is not None and "seq" in mesh.axis_names:
            rngs = None if deterministic else \
                {"dropout": self.make_rng("dropout")}
            enc_out = self.encode_seq_parallel(
                feats, rel_lens, mesh, speaker_embs, speaker_rel,
                deterministic=deterministic, rngs=rngs)
        elif mesh is not None and "pipe" in mesh.axis_names:
            rngs = None if deterministic else \
                {"dropout": self.make_rng("dropout")}
            enc_out = self.encode_pipeline(
                feats, rel_lens, mesh, speaker_embs, speaker_rel,
                deterministic=deterministic, rngs=rngs)
        else:
            enc_out = self.encode(feats, rel_lens, speaker_embs,
                                  speaker_rel,
                                  deterministic=deterministic)
        dec_out, _ = self.predict(tokens_bos)
        return enc_out, dec_out

    def __call__(self, feats, rel_lens, tokens_bos, enroll_feats=None,
                 enroll_rel_lens=None, external_speaker_embs=None,
                 deterministic=True, band_width=None,
                 token_rel_lens=None, mesh=None):
        """Training/eval forward pass -> (logits, enc_out).

        ``enroll_feats`` drives the scratch speaker encoder;
        ``external_speaker_embs`` ((B, 1, E) or (B, S, E)) bypasses it
        (the ``pretrained`` variant's frozen WavLM d-vectors).

        With ``band_width`` set (and ``token_rel_lens`` given), the
        joint/head run only on a diagonal band: logits come back as
        (B, T', band_width, V) and the loss side recomputes the same
        ``band_centers`` (deterministic in the lengths).

        ``mesh``: see ``encode_predict`` — routes the encoder through
        the sequence-/pipeline-parallel variant when the mesh carries a
        'seq'/'pipe' axis.
        """
        enc_out, dec_out = self.encode_predict(
            feats, rel_lens, tokens_bos, enroll_feats=enroll_feats,
            enroll_rel_lens=enroll_rel_lens,
            external_speaker_embs=external_speaker_embs,
            deterministic=deterministic, mesh=mesh)
        if band_width is not None:
            from tsasr_tpu.ops.rnnt_loss_banded import band_centers
            Tp = enc_out.shape[1]
            U = tokens_bos.shape[1] - 1
            t_lens = jnp.round(rel_lens * Tp).astype(jnp.int32)
            u_lens = jnp.round(token_rel_lens * U).astype(jnp.int32)
            centers = band_centers(t_lens, u_lens, Tp, band_width)
            logits = self.joint_logits_banded(enc_out, dec_out, centers,
                                              band_width)
        else:
            logits = self.joint_logits(enc_out[:, :, None, :],
                                       dec_out[:, None, :, :])
        return logits, enc_out
