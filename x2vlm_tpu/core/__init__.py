from x2vlm_tpu.core.config import Config, load_config, parse_overrides, apply_overrides, read_json
from x2vlm_tpu.core.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    create_mesh,
    global_mesh,
    get_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    is_main_process,
)
from x2vlm_tpu.core.precision import Policy, DEFAULT_POLICY, FP32_POLICY, DynamicLossScale
