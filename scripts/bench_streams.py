"""HBM stream-rate microbenchmark: what elementwise bandwidth can this chip
actually sustain, per access pattern?

Motivation (round 4): the RN50 recipe trace shows the residual+BN loop
fusions at ~631 GiB/s of the chip's 820 GiB/s paper peak (the three layer1
block fusions, 9.5 ms/step each — VERDICT r3 #1).  Whether that 23% gap is
XLA inefficiency (attackable with a Pallas BN) or the machine's practical
mixed read/write stream ceiling (irreducible) decides where the remaining
perf work goes.  This measures, with strict state->state data-dependency
chains (the axon tunnel fakes timings otherwise — CLAUDE.md):

  copy        y = x                      (1R + 1W)
  scale       y = x * 1.0001             (1R + 1W)
  add         y = x + r                  (2R + 1W)
  bn_res_relu y = relu(xhat*g + b + r)   (2R + 1W + channel vectors)
  bn_stats    mean/var over (B,H,W)      (1R)

on the exact recipe fusion shape bf16[256,32,32,256] plus f32 and
row-major variants.  Writes bench_artifacts/stream_rates.json.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(fn, state, iters, warmup=3):
    """Run state = fn(state) in a dependency chain; returns s/iter."""
    for _ in range(warmup):
        state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="bench_artifacts/stream_rates.json")
    args = ap.parse_args()

    shape = (256, 32, 32, 256)  # the layer1 fusion shape (2B views)
    results = {"shape": list(shape), "cases": {}}

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        nbytes = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(shape), dtype
        )
        r = jnp.asarray(
            np.random.default_rng(1).standard_normal(shape), dtype
        )
        g = jnp.ones((shape[-1],), jnp.float32)
        b = jnp.zeros((shape[-1],), jnp.float32)

        @jax.jit
        def f_copy(s):
            # unary chains need a value change or XLA folds them; the tiny
            # add keeps it 1R+1W
            return s + jnp.asarray(1, s.dtype)

        @jax.jit
        def f_add(s, r=r):
            return s + r

        @jax.jit
        def f_bn_res_relu(s, r=r, g=g, b=b):
            xh = s.astype(jnp.float32)
            y = xh * g + b + r.astype(jnp.float32)
            return jnp.maximum(y, 0.0).astype(s.dtype)

        @jax.jit
        def f_stats(s):
            m = jnp.mean(s.astype(jnp.float32), axis=(0, 1, 2))
            v = jnp.mean(
                jnp.square(s.astype(jnp.float32)), axis=(0, 1, 2)
            ) - jnp.square(m)
            # fold the stats back in so the chain depends on the reduce
            return s + (m[0] * 0 + v[0] * 0).astype(s.dtype)

        cases = {
            "copy_1r1w": (f_copy, 2 * nbytes),
            "add_2r1w": (f_add, 3 * nbytes),
            "bn_res_relu_2r1w": (f_bn_res_relu, 3 * nbytes),
            "stats_1r": (f_stats, nbytes),
        }
        for name, (fn, bytes_moved) in cases.items():
            sec = timed_chain(fn, x, args.iters)
            gbs = bytes_moved / sec / 1e9
            key = f"{dtype_name}:{name}"
            results["cases"][key] = {
                "ms": sec * 1e3, "GBps": gbs, "bytes": bytes_moved,
            }
            print(f"{key:28s} {sec*1e3:8.3f} ms   {gbs:7.1f} GB/s")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
