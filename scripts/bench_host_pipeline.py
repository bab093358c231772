"""Sustained end-to-end (host->device) training throughput (VERDICT r2 #3).

Feeds the REAL train step through HostPipeline + device_prefetch from
on-disk JPEGs (synthetic FreiHAND, enough unique files to defeat trivial
page-cache artifacts), with the native libjpeg pool when built.  Reports:

  * device-only rate: the HBM-resident bench (no host in the loop)
  * host-only rate:   decode+collate throughput with no device consumer
  * sustained rate:   the overlapped pipeline end to end
  * overlap efficiency = sustained / min(host-only, device-only) — 1.0
    means decode fully hides behind the device step (SURVEY hard part #5)
  * host-core requirement: device_rate / per-thread decode rate

On the 1-core CI box the pipeline is host-bound by construction; the
overlap efficiency and the per-core decode rate are the transferable
numbers (a production TPU host has dozens of cores).

Usage: python scripts/bench_host_pipeline.py [--steps 6] [--threads 8]
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/peclr_bench_fh")
    ap.add_argument("--num-unique", type=int, default=640)
    ap.add_argument("--microbatch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=16)
    ap.add_argument("--resnet", default="50")
    ap.add_argument("--view", type=int, default=128)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--out", default=None, help="optional JSON artifact path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
    from peclr_tpu.data.freihand import FreihandSource
    from peclr_tpu.data.pipeline import HostPipeline, device_prefetch
    from peclr_tpu.data.synthetic import generate_freihand_like
    from peclr_tpu.data import native_loader
    from peclr_tpu.train.recipe import build_pretrain_state, synthetic_pretrain_batch
    from peclr_tpu.train.step import make_peclr_train_step

    if not os.path.exists(os.path.join(args.root, "training_xyz.json")):
        print(f"generating {args.num_unique}x4 synthetic FreiHAND JPEGs...")
        generate_freihand_like(args.root, num_unique=args.num_unique, seed=7)

    global_batch = args.microbatch * args.accum
    src = FreihandSource(args.root, "train", seed=5, train_ratio=0.999)
    pipe = HostPipeline([src], batch_size=global_batch, canvas=224, seed=5,
                        num_threads=args.threads)
    print(f"dataset: {len(src)} JPEGs, native loader: "
          f"{native_loader.available()}, threads {args.threads}")

    model, state, tx = build_pretrain_state(
        resnet=args.resnet, batch=args.microbatch, accum=args.accum,
        view=args.view,
    )
    step = make_peclr_train_step(
        model, tx, peclr_pretrain_flags(),
        AugmentationParams(resize_shape=(args.view, args.view)),
        accum=args.accum, with_stats=False, donate=True,
    )
    key = jax.random.PRNGKey(0)

    # -- device-only rate (HBM-resident batch, state-chained) --------------
    dev_batch = synthetic_pretrain_batch(global_batch, canvas=224)
    s = state
    s, m = step(s, dev_batch, jax.random.fold_in(key, 0))
    s, m = step(s, dev_batch, jax.random.fold_in(key, 1))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        s, m = step(s, dev_batch, jax.random.fold_in(key, 2 + i))
    jax.block_until_ready(m["loss"])
    dev_rate = global_batch * args.steps / (time.perf_counter() - t0)
    print(f"device-only: {dev_rate:.0f} img/s")

    # -- host-only rate (decode+collate, no device consumer) ---------------
    t0 = time.perf_counter()
    n_host = 0
    host_batch = None
    for batch in pipe.batches(args.steps, epoch=0):
        n_host += len(batch["image"])
        host_batch = batch
    host_rate = n_host / (time.perf_counter() - t0)
    cores = os.cpu_count() or 1
    host_per_core = host_rate / min(args.threads, cores)
    print(f"host-only:   {host_rate:.0f} img/s "
          f"({host_per_core:.0f} per core, {cores} cores)")

    # -- host->device transfer rate (the tunnel/PCIe link) ------------------
    t0 = time.perf_counter()
    for _ in range(max(args.steps // 2, 2)):
        moved = jax.device_put(host_batch)
        jax.block_until_ready(moved)
    xfer_rate = global_batch * max(args.steps // 2, 2) / (
        time.perf_counter() - t0
    )
    batch_mb = sum(v.nbytes for v in host_batch.values()) / 1e6
    print(f"transfer:    {xfer_rate:.0f} img/s "
          f"({xfer_rate / global_batch * batch_mb:.0f} MB/s link)")

    # -- sustained overlapped pipeline (state was donated above; rebuild) --
    model, s, tx = build_pretrain_state(
        resnet=args.resnet, batch=args.microbatch, accum=args.accum,
        view=args.view,
    )
    step = make_peclr_train_step(
        model, tx, peclr_pretrain_flags(),
        AugmentationParams(resize_shape=(args.view, args.view)),
        accum=args.accum, with_stats=False, donate=True,
    )
    warm = device_prefetch(pipe.batches(1, epoch=1))
    for b in warm:
        s, m = step(s, b, jax.random.fold_in(key, 100))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    n_sus = 0
    for i, b in enumerate(device_prefetch(pipe.batches(args.steps, epoch=2))):
        s, m = step(s, b, jax.random.fold_in(key, 200 + i))
        n_sus += global_batch
    jax.block_until_ready(m["loss"])
    sus_rate = n_sus / (time.perf_counter() - t0)

    rates = {"host": host_rate, "device": dev_rate, "transfer": xfer_rate}
    bound_by = min(rates, key=rates.get)
    result = {
        "device_only_img_s": round(dev_rate, 1),
        "host_only_img_s": round(host_rate, 1),
        "host_per_core_img_s": round(host_per_core, 1),
        "transfer_img_s": round(xfer_rate, 1),
        "transfer_mb_s": round(xfer_rate / global_batch * batch_mb, 1),
        "sustained_img_s": round(sus_rate, 1),
        "overlap_efficiency": round(sus_rate / min(rates.values()), 3),
        "bound_by": bound_by,
        "host_cores_needed_for_device_rate": round(
            dev_rate / host_per_core, 1
        ),
        "native_loader": native_loader.available(),
        "cpu_cores": cores,
        "config": {k: v for k, v in vars(args).items() if k != "out"},
    }
    print(json.dumps(result, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
