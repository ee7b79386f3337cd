#!/bin/bash
# Auto-generated task launcher (see tasks/generate.py)
source "$(dirname "$0")/../config.sh"

python train_librispeechmix_scratch.py hparams/LibriSpeechMix/conformer-t_scratch.yaml \
    --data_folder "$DATA_FOLDER" \
    --num_epochs "$NUM_EPOCHS" \
    --experiment_name LibriSpeechMix/scratch/TrimNonTarget4s/Prod/Causal \
    --trim_nontarget 4 \
    --injection_mode prod \
    --causal_encoder true --frontend_padding causal \
    $EXTRA_ARGS
