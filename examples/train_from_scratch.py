"""Example: train a QuartzNet CTC model from scratch on NeMo manifests.

    python examples/train_from_scratch.py \
        --train-manifest train.json --val-manifest val.json --epochs 50
"""

import argparse

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.data import ManifestDatamodule, ManifestSpeechDataset
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer, char_tokenizer, get_most_frequent_tokens
from thunder_tpu.training import Trainer, onecycle
from thunder_tpu.training.loggers import ConsoleLogger


def main():
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--train-manifest", required=True)
    p.add_argument("--val-manifest", required=True)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-lr", type=float, default=3e-3)
    p.add_argument("--quartznet-15x5", action="store_true", help="15x5 instead of 5x5")
    args = p.parse_args()

    # 1. vocabulary from the training transcripts
    corpus = " ".join(ManifestSpeechDataset(args.train_manifest).all_outputs())
    tokens = get_most_frequent_tokens(corpus, char_tokenizer, minimum_frequency=5)
    text_transform = BatchTextTransformer(tokens=tokens)

    # 2. model: mel frontend with SpecAugment + QuartzNet + CTC head
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(num_time_masks=2, num_freq_masks=2),
        encoder=QuartznetEncoder(repeat_blocks=3 if args.quartznet_15x5 else 1, dropout=0.1),
        decoder=Conv1dDecoder(num_classes=text_transform.num_tokens),
        text_transform=text_transform,
    )

    # 3. train
    dm = ManifestDatamodule(args.train_manifest, args.val_manifest, args.val_manifest,
                            batch_size=args.batch_size)
    trainer = Trainer(
        max_epochs=args.epochs,
        optimizer_kwargs={"learning_rate": args.max_lr / 25, "weight_decay": 1e-3},
        lr_scheduler_builder=onecycle,
        lr_scheduler_kwargs={"max_lr": args.max_lr, "total_steps_arg": "total_steps"},
        gradient_clip_norm=1.0,
        checkpoint_dir="ckpts",
        logger=ConsoleLogger(),
    )
    module = trainer.fit(module, datamodule=dm)


if __name__ == "__main__":
    main()
