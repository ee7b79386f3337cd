# Shared launch configuration for the task grid (TPU-native equivalent of
# the reference's 8xGPU p3.16xlarge setup: one v4/v5p slice, all chips on
# the data axis unless TP is requested).
export DATA_FOLDER=${DATA_FOLDER:-"$HOME/data/LibriSpeechMix"}
export NUM_EPOCHS=${NUM_EPOCHS:-40}
export EXTRA_ARGS=${EXTRA_ARGS:-""}
