#!/bin/bash
# Auto-generated task launcher (see tasks/generate.py)
source "$(dirname "$0")/../config.sh"

python train_librispeechmix_scratch.py hparams/LibriSpeechMix/conformer-t_scratch.yaml \
    --data_folder "$DATA_FOLDER" \
    --num_epochs "$NUM_EPOCHS" \
    --experiment_name LibriSpeechMix/scratch/TrimNonTargetNone/Attn/Causal \
    --injection_mode cross_attention \
    --causal_encoder true --frontend_padding causal \
    $EXTRA_ARGS
