"""Tests for the synthetic LibriSpeechMix generator's encode_text mode.

Round-5 addition: the north-star comparison needs waveforms that
actually carry their transcripts (the plain mode's audio is
text-independent, which floors WER in the 90s — see
``reports/northstar_r4/README.md`` "Honest limitations"). These tests
pin the acoustic code's decodability and the mode's dataset plumbing.
"""

import json
import os

import numpy as np

from tools.make_synthetic_dataset import (
    CHAR_ALPHABET, CHAR_DUR, CHAR_F_BASE, CHAR_F_STEP, make_dataset,
    synth_utterance)


def _fft_decode(wav, n_chars, sample_rate=16000):
    cd = int(CHAR_DUR * sample_rate)
    out = []
    win = np.hanning(cd)
    freqs = np.fft.rfftfreq(cd, 1 / sample_rate)
    band = (freqs >= CHAR_F_BASE - 25) & (
        freqs <= CHAR_F_BASE + CHAR_F_STEP * (len(CHAR_ALPHABET) - 1) + 25)
    for i in range(n_chars):
        seg = wav[i * cd:(i + 1) * cd]
        if len(seg) < cd:
            break
        spec = np.abs(np.fft.rfft(seg * win))
        fpk = freqs[band][np.argmax(spec[band])]
        k = int(round((fpk - CHAR_F_BASE) / CHAR_F_STEP))
        out.append(CHAR_ALPHABET[max(0, min(len(CHAR_ALPHABET) - 1, k))])
    return "".join(out)


def test_encoded_utterance_is_decodable():
    rng = np.random.default_rng(3)
    text = "JUMPS OVER A LAZY DOG"
    dur = 0.1 + CHAR_DUR * len(text)
    wav = synth_utterance(rng, dur, 16000, f0=220.0, text=text)
    assert _fft_decode(wav, len(text)) == text


def test_encoded_dataset_durations_match_texts(tmp_path):
    out = str(tmp_path / "enc")
    make_dataset(out, n_speakers=3, utts_per_speaker=2, n_mix=4,
                 seed=1, encode_text=True)
    entries = [json.loads(line)
               for line in open(os.path.join(out, "train-2mix.jsonl"))]
    assert entries
    for e in entries:
        for text, dur in zip(e["texts"], e["durations"]):
            assert abs(dur - (0.1 + CHAR_DUR * len(text))) < 1e-6


def test_plain_mode_unchanged_shape(tmp_path):
    out = str(tmp_path / "plain")
    make_dataset(out, n_speakers=2, utts_per_speaker=2, n_mix=2, seed=0)
    entries = [json.loads(line)
               for line in open(os.path.join(out, "train-2mix.jsonl"))]
    assert len(entries) == 2
    assert all(1.0 <= d <= 3.0 for e in entries for d in e["durations"])
