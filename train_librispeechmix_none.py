#!/usr/bin/env python
"""Train a plain (non-target-speaker) transducer ASR system on the
mixtures — the ``none`` variant: no speaker conditioning
(reference ``train_librispeechmix_none.py``):

> python train_librispeechmix_none.py \
      hparams/LibriSpeechMix/conformer-t_none.yaml \
      --data_folder <path-to-LibriSpeechMix>
"""

from tsasr_tpu.recipes.librispeechmix import run_experiment

if __name__ == "__main__":
    run_experiment(variant="none")
