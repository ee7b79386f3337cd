#!/usr/bin/env python
"""Train a transducer-based TS-ASR system with a speaker encoder trained
from scratch (TPU-native; same public interface as the reference
``train_librispeechmix_scratch.py``):

> python train_librispeechmix_scratch.py \
      hparams/LibriSpeechMix/conformer-t_scratch.yaml \
      --data_folder <path-to-LibriSpeechMix> [--any_hparam override]
"""

from tsasr_tpu.recipes.librispeechmix import run_experiment

if __name__ == "__main__":
    run_experiment(variant="scratch")
