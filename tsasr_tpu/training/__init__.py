"""Training runtime: Brain-style trainer, checkpointing, schedulers,
epoch loop, distributed helpers."""

from tsasr_tpu.training.checkpoints import Checkpointer  # noqa: F401
from tsasr_tpu.training.epoch_loop import (  # noqa: F401
    EpochCounter,
    EpochCounterWithStopper,
)
from tsasr_tpu.training.schedulers import (  # noqa: F401
    NewBobScheduler,
    NoamScheduler,
    noam_schedule,
)
