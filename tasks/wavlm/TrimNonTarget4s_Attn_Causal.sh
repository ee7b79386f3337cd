#!/bin/bash
# Auto-generated task launcher (see tasks/generate.py)
source "$(dirname "$0")/../config.sh"

python train_librispeechmix_pretrained.py hparams/LibriSpeechMix/conformer-t_wavlm.yaml \
    --data_folder "$DATA_FOLDER" \
    --num_epochs "$NUM_EPOCHS" \
    --experiment_name LibriSpeechMix/wavlm/TrimNonTarget4s/Attn/Causal \
    --trim_nontarget 4 \
    --injection_mode cross_attention \
    --causal_encoder true --frontend_padding causal \
    $EXTRA_ARGS
