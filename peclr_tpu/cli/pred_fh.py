"""FreiHAND leaderboard CLI — the testing/pred_fh.py equivalent.

  python -m peclr_tpu.cli.pred_fh --model_path .../rn50.pth [-ds_path ...]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from peclr_tpu.constants import FREIHAND_DATA
    from peclr_tpu.eval.pred_fh import predict_leaderboard
    from peclr_tpu.models import RN25DPose, port
    from peclr_tpu.train.checkpoint import load_torch_checkpoint

    p = argparse.ArgumentParser(description="FreiHAND leaderboard inference")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("-ds_path", type=str, default=FREIHAND_DATA)
    p.add_argument("-batch_size", type=int, default=120)
    p.add_argument("-limit", type=int, default=None)
    p.add_argument("-out_dir", type=str, default="out")
    args = p.parse_args(argv)

    if "rn50" in args.model_path:
        size = "50"
    elif "rn152" in args.model_path:
        size = "152"
    else:
        raise SystemExit(
            "cannot infer model type from model_path (expect rn50/rn152 in "
            "the filename, like the released weights)"
        )
    sd = load_torch_checkpoint(args.model_path)
    variables = port.rn25d_checkpoint_to_variables(sd, size)
    model = RN25DPose(size=size)
    out = predict_leaderboard(
        model, variables, args.ds_path, f"rn{size}",
        batch_size=args.batch_size, limit=args.limit, out_dir=args.out_dir,
    )
    print(f"wrote {out} (+ .zip for CodaLab)")


if __name__ == "__main__":
    main()
