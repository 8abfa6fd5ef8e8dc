"""Training subsystem: tasks (strategy layer), jitted steps, loop,
plateau scheduling, checkpointing."""

from pmpu_tpu.train.schedule import ReduceLROnPlateau  # noqa: F401
from pmpu_tpu.train.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_lr,
)
from pmpu_tpu.train.tasks import ProbUNetTask, UNetTask, make_task  # noqa: F401
