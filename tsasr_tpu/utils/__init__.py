"""Framework utilities: hparams, metrics, logging, checkpoint helpers."""
