"""Example: fine-tune a pretrained QuartzNet on your own data, TPU-native.

Expects NeMo-style JSON-lines manifests (audio_filepath/text/duration) and a
checkpoint — an NGC name (downloads), a local .nemo, or an HF id.

    python examples/finetune_quartznet.py \
        --checkpoint QuartzNet5x5LS_En \
        --train-manifest train.json --val-manifest val.json
"""

import argparse

from thunder_tpu.data import ManifestDatamodule
from thunder_tpu.finetune import finetune_ctc_module
from thunder_tpu.models import Conv1dDecoder
from thunder_tpu.training import FinetuneEncoderDecoder, Trainer, onecycle
from thunder_tpu.training.loggers import ConsoleLogger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--train-manifest", required=True)
    p.add_argument("--val-manifest", required=True)
    p.add_argument("--tokens", default=None, help="e.g. \"abcdefghijklmnopqrstuvwxyz '\" for a new head")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-lr", type=float, default=1e-3)
    args = p.parse_args()

    kwargs = {}
    if args.tokens:
        kwargs = dict(tokens=list(args.tokens), decoder_builder=Conv1dDecoder)
    module = finetune_ctc_module(args.checkpoint, **kwargs)

    dm = ManifestDatamodule(
        args.train_manifest, args.val_manifest, args.val_manifest, batch_size=args.batch_size
    )
    trainer = Trainer(
        max_epochs=args.epochs,
        optimizer_kwargs={"learning_rate": args.max_lr / 25},
        lr_scheduler_builder=onecycle,
        lr_scheduler_kwargs={"max_lr": args.max_lr, "total_steps_arg": "total_steps"},
        callbacks=[FinetuneEncoderDecoder(unfreeze_encoder_at_epoch=1)],
        checkpoint_dir="ckpts",
        logger=ConsoleLogger(),
    )
    module = trainer.fit(module, datamodule=dm)

    # ship it
    from thunder_tpu.export import save_inference_bundle

    print("saved:", save_inference_bundle("finetuned_bundle", module))


if __name__ == "__main__":
    main()
