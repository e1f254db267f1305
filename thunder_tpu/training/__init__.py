"""Training: trainer loop, optimizers, metrics, checkpointing, finetune."""

from thunder_tpu.training.metrics import CharErrorRate, WordErrorRate, cer, edit_distance, wer  # noqa: F401
from thunder_tpu.training.optim import adamw, build_optimizer, finetune_schedule_transform, onecycle, sgd  # noqa: F401
from thunder_tpu.training.trainer import FinetuneEncoderDecoder, Trainer, TrainState  # noqa: F401
