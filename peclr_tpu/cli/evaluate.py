"""Downstream evaluation CLI — EPE/AUC/procrustes on the FreiHAND val split
(the reference's downstream_evaluation, experiments/utils.py:463-532)."""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate a 2.5D pose model")
    p.add_argument("-checkpoint", type=str, required=True,
                   help="orbax checkpoint dir or torch .pth/.npz")
    p.add_argument("-resnet_size", type=str, default="50",
                   choices=["50", "152"])
    p.add_argument("-batch_size", type=int, default=64)
    p.add_argument("-num_batches", type=int, default=None)
    p.add_argument("-train_ratio", type=float, default=0.9)
    p.add_argument("-seed", type=int, default=5)
    p.add_argument("-crop_size", type=int, default=128)
    p.add_argument("--no_procrustes", action="store_true")
    p.add_argument("--use_palm", action="store_true",
                   help="evaluate with the wrist moved to the palm midpoint "
                        "(labels and procrustes targets, data_set.py:305-314)")
    return p


def load_model_variables(args):
    import jax
    import jax.numpy as jnp

    from peclr_tpu.models import RN25DPose, port
    from peclr_tpu.train.checkpoint import load_torch_checkpoint

    model = RN25DPose(size=args.resnet_size)
    if args.checkpoint.endswith((".pth", ".npz", ".ckpt")):
        sd = load_torch_checkpoint(args.checkpoint)
        variables = port.rn25d_checkpoint_to_variables(sd, args.resnet_size)
    else:
        import orbax.checkpoint as ocp

        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.crop_size, args.crop_size, 3)),
            train=False,
        )
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(args.checkpoint, None)
        variables = {
            "params": state["params"], "batch_stats": state["batch_stats"]
        }
        del template
    return model, variables


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
    from peclr_tpu.constants import FREIHAND_DATA
    from peclr_tpu.data.freihand import FreihandSource
    from peclr_tpu.data.pipeline import HostPipeline
    from peclr_tpu.eval.evaluate import evaluate

    args = build_parser().parse_args(argv)
    model, variables = load_model_variables(args)

    src = FreihandSource(
        FREIHAND_DATA, "val", seed=args.seed, train_ratio=args.train_ratio
    )
    pipe = HostPipeline([src], batch_size=args.batch_size, canvas=224,
                        shuffle=False)

    @jax.jit
    def predict_25d(images, K):
        return model.apply(variables, images, K=K, train=False)["kp25d"]

    results = evaluate(
        predict_25d,
        pipe,
        AugmentationFlags(crop=True, resize=True),
        AugmentationParams(resize_shape=(args.crop_size, args.crop_size)),
        use_procrustes=not args.no_procrustes,
        num_batches=args.num_batches,
        use_palm=args.use_palm,
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
