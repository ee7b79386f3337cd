"""Device mesh + sharding: the TPU-native replacement for the reference's
NCCL/Gloo/MPI process groups (SURVEY.md §5.8)."""

from tsasr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_batch,
)
from tsasr_tpu.parallel.pp_parallel import (  # noqa: F401
    pp_encoder_apply,
    stack_layer_params,
)
from tsasr_tpu.parallel.distributed import (  # noqa: F401
    if_main_process,
    run_on_main,
    ddp_barrier,
    all_gather_object,
)
