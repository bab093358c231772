"""A/B microbench: XLA barrel shifter vs fused Pallas shift kernel on the
real warp shapes (RN50 recipe: microbatch 128, 224 canvas, 128 views).

Timings use a data-dependency chain (offsets perturbed by the previous
output) — independent dispatches report fake times through the axon tunnel
(CLAUDE.md).  Run ONE TPU process at a time.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.ops import warp_mxu


def bench(fn, args, iters=30, warmup=3):
    out = None
    for _ in range(warmup):
        args, out = fn(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        args, out = fn(args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--h", type=int, default=224)
    ap.add_argument("--w", type=int, default=256)  # 128-aligned padded width
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--dtype", default="uint8", choices=["uint8", "bfloat16"])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.dtype == "uint8":
        images = jnp.asarray(
            rng.integers(0, 256, (args.b, args.h, args.w, 3), dtype=np.uint8)
        )
    else:
        images = jnp.asarray(
            rng.uniform(0, 255, (args.b, args.h, args.w, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)
    offsets0 = jnp.asarray(
        rng.uniform(-80, 80, (args.b, args.h)).astype(np.float32)
    )

    def make(fn_use_pallas):
        @jax.jit
        def step(offsets):
            out = warp_mxu._shift_rows_any(
                images, offsets, args.window, jnp.bfloat16, fn_use_pallas
            )
            # chain: next offsets depend on this output
            new_off = offsets + 0.0 * out.astype(jnp.float32).mean()
            return new_off, out

        return step

    for name, use_pallas in (("xla", False), ("pallas", True)):
        step = make(use_pallas)
        ms = bench(step, offsets0, iters=args.iters)
        gb = (images.size * images.dtype.itemsize
              + args.b * args.h * args.window * 3 * 2) / 1e9
        print(f"{name:7s} {ms:8.3f} ms   ({gb / (ms / 1e3):6.1f} GB/s "
              f"of in+out traffic)")


if __name__ == "__main__":
    main()
