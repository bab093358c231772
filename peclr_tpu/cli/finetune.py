"""Supervised fine-tune CLI for the 2.5D pose model (RN25DPose).

Trains on FreiHAND with the supervised sample path (K'=T@K), optionally
initializing the backbone from a PeCLR pretraining checkpoint
(-experiment_key / -pretrained, the reference's downstream flow through
get_encoder_state_dict + peclr_to_torchvision).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="RN25D fine-tune (TPU)")
    p.add_argument("-batch_size", type=int, default=128)
    p.add_argument("-epochs", type=int, default=100)
    p.add_argument("-seed", type=int, default=5)
    p.add_argument("-lr", type=float, default=1e-4)
    p.add_argument("-optimizer", type=str, default="adam",
                   choices=["LARS", "adam"])
    p.add_argument("-train_ratio", type=float, default=0.9)
    p.add_argument("-resnet_size", type=str, default="50",
                   choices=["50", "152"])
    p.add_argument("-pretrained", type=str, default=None,
                   help="PeCLR checkpoint (.npz/.pth) to init the backbone")
    p.add_argument("-loss_3d_weight", type=float, default=0.0)
    p.add_argument("--use_palm", action="store_true")
    p.add_argument("--crop", action="store_true", default=True)
    p.add_argument("--rotate", action="store_true")
    p.add_argument("--color_jitter", action="store_true")
    p.add_argument("-crop_size", type=int, default=128)
    p.add_argument("-workdir", type=str, default=None)
    p.add_argument("-save_top_k", type=int, default=3)
    p.add_argument("-num_workers", type=int, default=8)
    p.add_argument("-steps_per_epoch", type=int, default=None)
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
    from peclr_tpu.constants import FREIHAND_DATA, SAVED_MODELS_BASE_PATH
    from peclr_tpu.data.freihand import FreihandSource
    from peclr_tpu.data.pipeline import HostPipeline, device_prefetch
    from peclr_tpu.models import RN25DPose
    from peclr_tpu.train.checkpoint import CheckpointManager, load_torch_checkpoint
    from peclr_tpu.train.finetune import load_pretrained_encoder, make_finetune_step
    from peclr_tpu.train.optimizer import build_optimizer
    from peclr_tpu.train.state import TrainState
    from peclr_tpu.utils.logging import get_console_logger
    from peclr_tpu.utils.profiler import Throughput

    log = get_console_logger("peclr_tpu.finetune")
    args = build_parser().parse_args(argv)

    src = FreihandSource(
        FREIHAND_DATA, "train", seed=args.seed, train_ratio=args.train_ratio
    )
    pipe = HostPipeline(
        [src], batch_size=args.batch_size, canvas=224, seed=args.seed,
        num_threads=args.num_workers,
    )
    steps = args.steps_per_epoch or pipe.steps_per_epoch()

    model = RN25DPose(size=args.resnet_size)
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.crop_size, args.crop_size, 3)),
        train=False,
    )
    if args.pretrained:
        if os.path.isdir(args.pretrained):
            # orbax PeCLR training checkpoint -> reference-layout dict
            import orbax.checkpoint as ocp

            from peclr_tpu.models import port

            with ocp.StandardCheckpointer() as ckptr:
                peclr_state = ckptr.restore(os.path.abspath(args.pretrained), None)
            sd = port.variables_to_peclr_checkpoint(
                {
                    "params": peclr_state["params"],
                    "batch_stats": peclr_state["batch_stats"],
                },
                args.resnet_size,
            )
        else:
            sd = load_torch_checkpoint(args.pretrained)
        variables = load_pretrained_encoder(variables, sd, args.resnet_size)
        log.info(f"initialized backbone from {args.pretrained}")

    tx, schedule = build_optimizer(
        variables["params"], base_lr=args.lr, batch_size=args.batch_size,
        accum=1, steps_per_epoch=steps, epochs=args.epochs,
        optimizer=args.optimizer,
    )
    state = TrainState.create(variables, tx)
    flags = AugmentationFlags(
        crop=args.crop, rotate=args.rotate, color_jitter=args.color_jitter,
        resize=True,
    )
    aug = AugmentationParams(resize_shape=(args.crop_size, args.crop_size))
    step = make_finetune_step(
        model, tx, flags, aug, use_palm=args.use_palm,
        loss_3d_weight=args.loss_3d_weight,
    )
    workdir = args.workdir or os.path.join(SAVED_MODELS_BASE_PATH, "rn25d")
    ckpt = CheckpointManager(workdir, save_top_k=args.save_top_k)

    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        meter = Throughput()
        losses = []
        for i, batch in enumerate(
            device_prefetch(pipe.batches(steps, epoch=epoch))
        ):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(
                state, batch, jax.random.fold_in(key, epoch * steps + i)
            )
            meter.tick(args.batch_size)
            losses.append(metrics["loss"])
        mean_loss = float(np.mean(jax.device_get(losses)))
        log.info(
            f"epoch {epoch}: loss={mean_loss:.4f} "
            f"({(meter.images_per_sec or 0):.0f} img/s)"
        )
        ckpt.save(epoch, jax.device_get(state),
                  {"checkpoint_saving_loss": mean_loss})


if __name__ == "__main__":
    main()
