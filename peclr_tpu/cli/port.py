"""Checkpoint port CLI: convert between orbax training checkpoints, the
reference's PeCLR checkpoint layout, torchvision state dicts and
RN_25D_wMLPref weights — the port_model.py equivalent, both directions."""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Checkpoint conversion")
    p.add_argument("src", help="source checkpoint (orbax dir, .pth, .npz)")
    p.add_argument("dst", help="destination .npz path")
    p.add_argument(
        "-format",
        required=True,
        choices=[
            "peclr_to_torchvision",   # PeCLR ckpt -> torchvision encoder
            "torchvision_to_peclr",   # torchvision -> PeCLR encoder subtree
            "orbax_to_peclr",         # our training state -> reference layout
            "orbax_to_torchvision",
        ],
    )
    p.add_argument("-resnet_size", type=str, default="50",
                   choices=["18", "34", "50", "101", "152"])
    return p


def _load(src: str):
    from peclr_tpu.train.checkpoint import load_torch_checkpoint

    if src.endswith((".pth", ".ckpt", ".npz")):
        return load_torch_checkpoint(src)
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(src, None)


def main(argv=None):
    from peclr_tpu.models import port

    args = build_parser().parse_args(argv)
    size = args.resnet_size
    payload = _load(args.src)

    if args.format == "peclr_to_torchvision":
        variables = port.peclr_checkpoint_to_variables(payload, size)
        out = port.peclr_to_torchvision(variables, size)
    elif args.format == "torchvision_to_peclr":
        variables = port.torchvision_to_peclr_encoder(payload, size)
        out = port.variables_to_peclr_checkpoint(variables, size)
    elif args.format in ("orbax_to_peclr", "orbax_to_torchvision"):
        variables = {
            "params": payload["params"],
            "batch_stats": payload["batch_stats"],
        }
        if args.format == "orbax_to_peclr":
            out = port.variables_to_peclr_checkpoint(variables, size)
        else:
            out = port.peclr_to_torchvision(variables, size)
    else:
        raise ValueError(args.format)

    np.savez(args.dst, **out)
    print(f"wrote {len(out)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
