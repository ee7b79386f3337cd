#!/bin/bash
# Auto-generated task launcher (see tasks/generate.py)
source "$(dirname "$0")/../config.sh"

python train_librispeechmix_none.py hparams/LibriSpeechMix/conformer-t_none.yaml \
    --data_folder "$DATA_FOLDER" \
    --num_epochs "$NUM_EPOCHS" \
    --experiment_name LibriSpeechMix/none/TrimNonTarget32s \
    --trim_nontarget 32 \
    $EXTRA_ARGS
