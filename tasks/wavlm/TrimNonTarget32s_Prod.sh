#!/bin/bash
# Auto-generated task launcher (see tasks/generate.py)
source "$(dirname "$0")/../config.sh"

python train_librispeechmix_pretrained.py hparams/LibriSpeechMix/conformer-t_wavlm.yaml \
    --data_folder "$DATA_FOLDER" \
    --num_epochs "$NUM_EPOCHS" \
    --experiment_name LibriSpeechMix/wavlm/TrimNonTarget32s/Prod \
    --trim_nontarget 32 \
    --injection_mode prod \
    $EXTRA_ARGS
