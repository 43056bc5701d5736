from x2vlm_tpu.train.optim import create_optimizer, lr_schedule, param_labels
from x2vlm_tpu.train.trainer import (
    TrainState, create_train_state, make_train_step, make_grad_fn,
    make_apply_grads, tree_add,
)
from x2vlm_tpu.train.metrics import SmoothedValue, MetricLogger
from x2vlm_tpu.train import checkpoint
