from x2vlm_tpu.parallel.partition import fsdp_param_shardings, state_shardings, replicate_tree
