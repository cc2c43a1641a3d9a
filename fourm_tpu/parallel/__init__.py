from .mesh import (
    model_shardings,
    tensor_sharding_for,
    batch_sharding,
    fsdp_sharding_for,
    make_mesh,
    params_shardings,
    replicated,
)
from .train import TrainState, build_train_step, frozen_trunk_mask, init_train_state
from .launch import initialize_multihost, is_main_process, process_count, process_index
