"""Training: trainer loop, optimizers, metrics, checkpointing, finetune."""

from thunder_tpu.training.metrics import CharErrorRate, WordErrorRate, cer, edit_distance, wer  # noqa: F401
from thunder_tpu.training.optim import (  # noqa: F401
    adamw,
    build_optimizer,
    finetune_schedule_transform,
    onecycle,
    plateau_schedule_transform,
    plateau_update,
    reduce_on_plateau,
    sgd,
)
from thunder_tpu.training.trainer import (  # noqa: F401
    EarlyStopping,
    FinetuneEncoderDecoder,
    Trainer,
    TrainState,
)
