"""Multi-chip scaling benchmark: the full PeCLR train step data-parallel
over every visible device.

On a real pod slice this measures weak scaling (global batch = per-chip
microbatch x accum x n_chips) and prints per-chip throughput — the global-
view NT-Xent means the loss semantics match the single-chip program at the
same global batch (PARITY §2.2).  On a CPU host it runs on the virtual
device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) and only
validates that the sharded program compiles and steps — CPU timings are not
meaningful, and the config must stay tiny (the CPU collective runtime
hard-aborts a rendezvous after 40 s, which big per-step configs exceed on
an oversubscribed host):

  python scripts/bench_multichip.py --batch 2 --accum 2 --iters 1 \
      --canvas 64 --view 32 --resnet 18

Pod usage: python scripts/bench_multichip.py [--batch 128] [--accum 4]

Scaling-equality table (--scaling_table): runs the SAME global batch on
1/2/4/8-device meshes and records the per-mesh losses of two chained steps
to bench_artifacts/multichip_scaling.json — the committed artifact behind
tests/test_bench_artifacts.py's loss-equality-across-mesh-sizes assertion
(global-view NT-Xent: mesh size must not change program semantics).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
from peclr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from peclr_tpu.train.recipe import build_pretrain_state, synthetic_pretrain_batch
from peclr_tpu.train.step import make_peclr_train_step


def scaling_table(args):
    """Fixed global batch across mesh sizes; record two chained losses per
    mesh size (step 2 depends on step 1's full update, so equality is a
    whole-program statement, not just a loss-reduction one)."""
    devices = jax.devices()
    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    assert max(sizes) <= len(devices), (sizes, len(devices))
    global_n = args.batch * args.accum  # args.batch = GLOBAL microbatch here
    rows = []
    for n in sizes:
        mesh = make_mesh(devices=devices[:n])
        model, state, tx = build_pretrain_state(
            resnet=args.resnet, batch=args.batch, accum=args.accum,
            view=args.view, dtype=jnp.float32,
        )
        state = jax.device_put(state, replicated(mesh))
        step = make_peclr_train_step(
            model, tx, peclr_pretrain_flags(),
            AugmentationParams(resize_shape=(args.view, args.view)),
            accum=args.accum, with_stats=False, donate=False,
        )
        batch = synthetic_pretrain_batch(
            global_n, canvas=args.canvas, sharding=batch_sharding(mesh)
        )
        key = jax.random.PRNGKey(0)
        state, m1 = step(state, batch, key)
        state, m2 = step(state, batch, jax.random.fold_in(key, 1))
        rows.append({
            "mesh": n,
            "loss_step1": float(m1["loss"]),
            "loss_step2": float(m2["loss"]),
        })
        print(f"mesh {n}: loss1={rows[-1]['loss_step1']:.6f} "
              f"loss2={rows[-1]['loss_step2']:.6f}")
    artifact = {
        "config": {
            "global_microbatch": args.batch, "accum": args.accum,
            "resnet": args.resnet, "canvas": args.canvas, "view": args.view,
            "platform": devices[0].platform, "mesh_sizes": sizes,
        },
        "rows": rows,
    }
    out = os.path.join("bench_artifacts", "multichip_scaling.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128, help="per-chip microbatch")
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--resnet", default="50")
    ap.add_argument("--canvas", type=int, default=224)
    ap.add_argument("--view", type=int, default=128)
    ap.add_argument("--scaling_table", action="store_true",
                    help="loss-equality sweep over --mesh_sizes at a fixed "
                         "global batch (--batch is the GLOBAL microbatch)")
    ap.add_argument("--mesh_sizes", default="1,2,4,8")
    args = ap.parse_args()

    if args.scaling_table:
        scaling_table(args)
        return

    mesh = make_mesh()
    n = mesh.devices.size
    global_n = args.batch * args.accum * n
    print(f"mesh: {n} x {jax.devices()[0].platform}, global batch/step {global_n}")

    model, state, tx = build_pretrain_state(
        resnet=args.resnet, batch=args.batch * n, accum=args.accum,
        view=args.view,
    )
    state = jax.device_put(state, replicated(mesh))
    step = make_peclr_train_step(
        model, tx, peclr_pretrain_flags(),
        AugmentationParams(resize_shape=(args.view, args.view)),
        accum=args.accum, with_stats=False, donate=True,
    )

    batch = synthetic_pretrain_batch(
        global_n, canvas=args.canvas, sharding=batch_sharding(mesh)
    )

    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)
    state, m = step(state, batch, jax.random.fold_in(key, 1))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = step(state, batch, jax.random.fold_in(key, 2 + i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"loss={float(m['loss']):.4f}  {dt * 1e3:.1f} ms/step  "
        f"{global_n / dt:.0f} img/s total  {global_n / dt / n:.0f} img/s/chip"
    )


if __name__ == "__main__":
    main()
