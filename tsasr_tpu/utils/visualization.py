"""Visualization helpers: waveform / fbank / attention / embedding /
grad-norm plots and waveform export.

Equivalent of the reference's recipe-level ``utils.py`` plotting surface
(``/root/reference/utils.py:66-491``): used by the recipe's
``plot_data`` / ``plot_attentions`` / ``plot_embeddings`` /
``plot_grad_norm`` hparams switches.
"""

import os

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_waveform(waveforms, sample_rate, output_image, labels=None,
                  opacity=1.0, legend=False):
    """One or several waveforms overlaid on a shared time axis."""
    plt = _plt()
    if isinstance(waveforms, np.ndarray) and waveforms.ndim == 1:
        waveforms = [waveforms]
    elif not isinstance(waveforms, (list, tuple)):
        waveforms = [np.asarray(waveforms)]
    fig, ax = plt.subplots(figsize=(10, 3))
    for i, wav in enumerate(waveforms):
        wav = np.asarray(wav)
        t = np.arange(len(wav)) / sample_rate
        label = labels[i] if labels and i < len(labels) else None
        ax.plot(t, wav, alpha=opacity, linewidth=0.5, label=label)
    ax.set_xlabel("time (s)")
    ax.set_ylabel("amplitude")
    if legend and labels:
        ax.legend(fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_image) or ".", exist_ok=True)
    fig.savefig(output_image, dpi=150)
    plt.close(fig)


def plot_fbanks(waveform, sample_rate, output_image, n_mels=80,
                n_fft=512, win_length=32.0):
    """Log-mel spectrogram image of one waveform."""
    import jax.numpy as jnp
    from tsasr_tpu.ops import Fbank
    plt = _plt()
    feats = Fbank(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                  win_length=win_length)(
        jnp.asarray(np.asarray(waveform))[None])[0]
    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(np.asarray(feats).T, aspect="auto", origin="lower",
                   interpolation="nearest")
    ax.set_xlabel("frame")
    ax.set_ylabel("mel bin")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_image) or ".", exist_ok=True)
    fig.savefig(output_image, dpi=150)
    plt.close(fig)


def plot_attention(attention, output_image):
    """Attention heads (H, T, S) as a grid of heatmaps."""
    plt = _plt()
    attention = np.asarray(attention)
    if attention.ndim == 2:
        attention = attention[None]
    n_heads = attention.shape[0]
    cols = min(n_heads, 4)
    rows = -(-n_heads // cols)
    fig, axes = plt.subplots(rows, cols,
                             figsize=(3.2 * cols, 2.8 * rows),
                             squeeze=False)
    for h in range(n_heads):
        ax = axes[h // cols][h % cols]
        ax.imshow(attention[h], aspect="auto", origin="lower")
        ax.set_title(f"head {h}", fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_image) or ".", exist_ok=True)
    fig.savefig(output_image, dpi=150)
    plt.close(fig)


def plot_embeddings(embeddings, speaker_labels, output_image, title=None,
                    perplexity=30):
    """t-SNE projection of speaker embeddings colored by speaker."""
    plt = _plt()
    from sklearn.manifold import TSNE
    embeddings = np.asarray(embeddings)
    perplexity = max(1, min(perplexity, len(embeddings) - 1))
    proj = TSNE(n_components=2, perplexity=perplexity,
                init="pca", random_state=0).fit_transform(embeddings)
    speakers = sorted(set(speaker_labels))
    fig, ax = plt.subplots(figsize=(6, 5))
    for spk in speakers:
        idx = [i for i, s in enumerate(speaker_labels) if s == spk]
        ax.scatter(proj[idx, 0], proj[idx, 1], s=12, label=str(spk))
    if len(speakers) <= 20:
        ax.legend(fontsize=7)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_image) or ".", exist_ok=True)
    fig.savefig(output_image, dpi=150)
    plt.close(fig)


def plot_grad_norm(grad_norms, output_image="grad_norm.jpg"):
    """Per-step gradient-norm curve."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(np.asarray(grad_norms), linewidth=0.7)
    ax.set_xlabel("step")
    ax.set_ylabel("grad norm")
    ax.set_yscale("log")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_image) or ".", exist_ok=True)
    fig.savefig(output_image, dpi=150)
    plt.close(fig)


def play_waveform(waveform, sample_rate, output_wav):
    """Export a waveform as a playable WAV (the reference writes the wav
    for offline listening)."""
    from tsasr_tpu.data.audio import write_wav
    os.makedirs(os.path.dirname(output_wav) or ".", exist_ok=True)
    write_wav(output_wav, np.asarray(waveform), sample_rate)
