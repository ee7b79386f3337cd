#!/bin/bash
# Auto-generated task launcher (see tasks/generate.py)
source "$(dirname "$0")/../config.sh"

python train_librispeechmix_none.py hparams/LibriSpeechMix/conformer-t_none.yaml \
    --data_folder "$DATA_FOLDER" \
    --num_epochs "$NUM_EPOCHS" \
    --experiment_name LibriSpeechMix/none/TrimNonTargetNone/Causal \
    --causal_encoder true --frontend_padding causal \
    $EXTRA_ARGS
