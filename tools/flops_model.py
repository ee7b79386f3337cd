"""Analytic FLOP model of the production TS-ASR training step.

Hand-computed from the module graph (models/transducer.py; reference
``conformer-t_scratch.yaml:122-251``), NOT from XLA's cost analysis —
XLA counts scan bodies once and misses the loss/LSTM recurrences
(round-2 verdict, weak #1). Convention: one matmul (m,k)x(k,n) = 2mkn
FLOPs; training = forward + backward, backward = 2x forward for every
parameterized contraction (dX and dW each cost one forward); elementwise
and lattice work counted separately at their op counts.
"""

import math
from dataclasses import dataclass, field


@dataclass
class FlopReport:
    parts: dict = field(default_factory=dict)

    def add(self, name, fwd, bwd_factor=3.0):
        """Record a component: fwd FLOPs and its train total
        (fwd * bwd_factor; 3x for matmuls, 1x for fwd-only ops)."""
        self.parts[name] = {"fwd": fwd, "train": fwd * bwd_factor}

    @property
    def fwd(self):
        return sum(p["fwd"] for p in self.parts.values())

    @property
    def train(self):
        return sum(p["train"] for p in self.parts.values())


def conv_frames(t, strides=(2, 2)):
    for s in strides:
        t = -(-t // s)
    return t


def conformer_layer_flops(B, L, d=256, ffn=2048, h=4, k=31):
    """One ConformerEncoderLayer forward."""
    f = 0.0
    # macaron FFNs: two blocks of (d->ffn, ffn->d)
    f += 2 * (2 * B * L * d * ffn + 2 * B * L * ffn * d)
    # MHA: fused qkv, out proj, pos proj (no batch dim on pos encodings)
    f += 2 * B * L * d * (3 * d)
    f += 2 * B * L * d * d
    f += 2 * (2 * L - 1) * d * d
    # attention scores (content + positional) and weighted values
    f += 2 * B * L * L * d          # Q K^T
    f += 2 * B * L * (2 * L - 1) * d  # Q P^T (rel-pos, pre-shift)
    f += 2 * B * L * L * d          # A V
    # conv module: pointwise d->2d (GLU), depthwise k, pointwise d->d
    f += 2 * B * L * d * (2 * d)
    f += 2 * B * L * d * k
    f += 2 * B * L * d * d
    return f


def frontend_flops(B, T_feats, n_mels=80, channels=(128, 128),
                   strides=(2, 2)):
    f = 0.0
    t, freq, cin = T_feats, n_mels, 1
    for ch, s in zip(channels, strides):
        t = -(-t // s)
        freq = -(-freq // s)
        f += 2 * B * t * freq * 9 * cin * ch      # 3x3 conv
        f += 2 * B * t * freq * cin * ch          # 1x1 residual
        cin = ch
    return f


def fbank_flops(B, n_samples, n_fft=512, n_mels=80, hop=160):
    frames = n_samples // hop + 1
    # rfft as ~5 N log2 N per frame + mel matmul
    f = B * frames * 5 * n_fft * math.log2(n_fft)
    f += 2 * B * frames * (n_fft // 2 + 1) * n_mels
    return f


def production_step_flops(B=96, mix_sec=4, enr_sec=5, U=60, sr=16000,
                          d=256, ffn=2048, h=4, k=31, enc_layers=12,
                          spk_layers=6, joint_dim=640, vocab=29,
                          lstm_hidden=512, n_mels=80, hop=160,
                          augmented=True):
    """-> FlopReport for one optimizer step of the bench configuration."""
    r = FlopReport()
    T_feats = mix_sec * sr // hop + 1
    S_feats = enr_sec * sr // hop + 1
    T = conv_frames(T_feats)
    S = conv_frames(S_feats)
    U1 = U + 1

    # host->features (in-jit): fbank for mixture + enrollment. The
    # resampler (speed perturb) is a windowed-sinc conv over the wav.
    feat = fbank_flops(B, mix_sec * sr) + fbank_flops(B, enr_sec * sr)
    if augmented:
        feat += 2 * B * (mix_sec * sr) * 64   # sinc resample, ~64 taps
    r.add("features", feat, bwd_factor=1.0)   # stop-gradient region

    r.add("frontend_mix", frontend_flops(B, T_feats))
    r.add("frontend_spk", frontend_flops(B, S_feats))
    # input proj: flattened (freq/4 * ch) -> d
    flat = (-(-n_mels // 4)) * 128
    r.add("input_proj", 2 * B * (T + S) * flat * d)

    r.add("encoder", sum(conformer_layer_flops(B, T, d, ffn, h, k)
                         for _ in range(enc_layers)))
    r.add("speaker_encoder", sum(conformer_layer_flops(B, S, d, ffn, h, k)
                                 for _ in range(spk_layers)))
    r.add("speaker_proj", 2 * B * d * d)
    r.add("encoder_proj", 2 * B * T * d * joint_dim)

    # predictor: one-hot embed (gather) + LSTM + proj
    lstm_in = vocab - 1
    r.add("lstm", 2 * B * U1 * (lstm_in + lstm_hidden) * 4 * lstm_hidden)
    r.add("decoder_proj", 2 * B * U1 * lstm_hidden * joint_dim)

    # joint: broadcast add (VPU) + head matmul over the full lattice
    r.add("joint_add", 2 * B * T * U1 * joint_dim, bwd_factor=2.0)
    r.add("head", 2 * B * T * U1 * joint_dim * vocab)

    # loss: log_softmax over V + wavefront lattice (fwd alpha + bwd
    # beta/grads ~ 2x), ~8 flops per cell for the logaddexp recurrences
    r.add("loss_softmax", 4 * B * T * U1 * vocab, bwd_factor=2.0)
    r.add("loss_lattice", 8 * B * T * U1, bwd_factor=2.0)

    # optimizer: ~10 elementwise ops per parameter (adamw + clip)
    n_params = (
        enc_layers * (2 * 2 * d * ffn + 4 * d * d + 2 * d * d + d * k)
        + spk_layers * (2 * 2 * d * ffn + 4 * d * d + 2 * d * d + d * k)
        + flat * d * 2 + 4 * lstm_hidden * (lstm_in + lstm_hidden)
        + lstm_hidden * joint_dim + d * joint_dim + joint_dim * vocab)
    r.add("optimizer", 10 * n_params, bwd_factor=1.0)
    return r


if __name__ == "__main__":
    import json
    r = production_step_flops()
    out = {k: {kk: round(vv / 1e9, 2) for kk, vv in v.items()}
           for k, v in r.parts.items()}
    print(json.dumps({"per_step_train_gflops": round(r.train / 1e9, 1),
                      "per_step_fwd_gflops": round(r.fwd / 1e9, 1),
                      "parts_gflops": out}, indent=1))
