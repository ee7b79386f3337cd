#!/usr/bin/env python
"""Train a transducer-based TS-ASR system conditioned on frozen WavLM
d-vectors — the ``pretrained`` variant
(reference ``train_librispeechmix_pretrained.py``):

> python train_librispeechmix_pretrained.py \
      hparams/LibriSpeechMix/conformer-t_wavlm.yaml \
      --data_folder <path-to-LibriSpeechMix>

Offline note: point ``--speaker_encoder_path`` at a locally-downloaded
copy of microsoft/wavlm-base-sv.
"""

from tsasr_tpu.recipes.librispeechmix import run_experiment

if __name__ == "__main__":
    run_experiment(variant="pretrained")
