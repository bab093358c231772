"""HBM stream-rate microbenchmark: what elementwise bandwidth can a
STANDALONE dependency-chained kernel sustain on this chip, per access
pattern?

Motivation (round 4): the RN50 recipe trace shows the residual+BN loop
fusions at ~631 GB/s of the chip's 820 GB/s paper peak (the three layer1
block fusions, 9.5 ms/step each — VERDICT r3 #1).  The question was whether
that gap is attackable with a Pallas BN kernel.  This measures, with strict
state->state data-dependency chains inside ONE jitted fori_loop dispatch
(the axon tunnel fakes timings otherwise — CLAUDE.md):

  copy        y = x + 1                  (1R + 1W)
  add         y = x + r                  (2R + 1W)
  bn_res_relu y = relu(xhat*g + b + r)   (2R + 1W + channel vectors)
  bn_stats    mean/var over (B,H,W)      (1R + 1W: the dependency chain
                                          forces a full-tensor carry write)

on the exact recipe fusion shape bf16[256,32,32,256], bf16 + f32.

MEASURED VERDICT (bench_artifacts/stream_rates.json, real v5e): the
standalone chain tops out at 330-440 GB/s — it UNDERESTIMATES the machine;
the same math inside the compiled train step runs at 631 GB/s because XLA
streams its own tiled layouts ({3,0,2,1:T(8,128)(2,1)}) and schedules the
fusion among neighbors.  Donating the carry (eliminating any loop-carry
copy) does not change the numbers, so the deficit is the entry-layout/
standalone-dispatch pattern itself, not a harness copy.  Consequence: a
Pallas BN/residual kernel — whose custom-call boundary pins exactly these
default layouts — starts ~2x BEHIND the XLA fusion it would replace.  The
VERDICT-r3 "fused Pallas BN" lever is measured dead; the remaining
loop-fusion gap (631 vs ~790 achieved by the best large HBM-bound ops
in-program) is scheduling headroom, attacked via compiler options instead
(BENCHLOG round 4).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _probe_scalar(s):
    return jnp.sum(s[:1, :1])


def timed_chain(fn, state, extras, iters, warmup=1):
    """Time `iters` dependency-chained applications of fn, run INSIDE one
    jitted fori_loop dispatch.

    Tunnel measurement rules (all three bit this script before it reported
    truth): (a) extras are jit ARGUMENTS — closure capture embeds the
    128 MB tensors as HLO constants and blows the remote-compile request
    limit (HTTP 413); (b) block_until_ready does not truly synchronize —
    only fetching a state-derived scalar does; (c) per-dispatch RPC latency
    is ~1.7 ms, swamping sub-ms kernels, so the chain must live in ONE
    dispatch via lax.fori_loop."""
    import functools

    import jax.lax as lax

    # donate the carry: without aliasing, every fori_loop iteration pays an
    # extra copy of the state (1R+1W), halving the apparent stream rate
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(s, *ex):
        return lax.fori_loop(0, iters, lambda i, t: fn(t, *ex), s)

    # main() reuses the source array across cases: copy on device so the
    # donation below consumes the copy, not the shared input
    state = jax.jit(lambda t: t + jnp.asarray(0, t.dtype))(state)
    for _ in range(warmup):
        state = run(state, *extras)  # donated in, fresh buffer out
    float(_probe_scalar(state))
    t0 = time.perf_counter()
    out = run(state, *extras)
    float(_probe_scalar(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
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
        def f_add(s, r):
            return s + r

        @jax.jit
        def f_bn_res_relu(s, r, g, b):
            xh = s.astype(jnp.float32)
            y = xh * g + b + r.astype(jnp.float32)
            return jnp.maximum(y, 0.0).astype(s.dtype)

        @jax.jit
        def f_stats(s):
            m = jnp.mean(s.astype(jnp.float32), axis=(0, 1, 2))
            v = jnp.mean(
                jnp.square(s.astype(jnp.float32)), axis=(0, 1, 2)
            ) - jnp.square(m)
            # fold the stats back in so the chain depends on the reduce;
            # the carry write this forces is a full-tensor 1W on top of the
            # reduce's 1R, so the case moves 2x nbytes (a pure streaming
            # reduce with no chain would be 1R, but the tunnel's timing
            # rules require the chain)
            return s + (m[0] * 0 + v[0] * 0).astype(s.dtype)

        cases = {
            "copy_1r1w": (f_copy, (), 2 * nbytes),
            "add_2r1w": (f_add, (r,), 3 * nbytes),
            "bn_res_relu_2r1w": (f_bn_res_relu, (r, g, b), 3 * nbytes),
            "stats_1r1w": (f_stats, (), 2 * nbytes),
        }
        for name, (fn, extras, bytes_moved) in cases.items():
            sec = timed_chain(fn, x, extras, args.iters)
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
