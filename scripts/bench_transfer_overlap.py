"""Dissect the host->device overlap loss in the feeding pipeline
(VERDICT r3 #8).

Round-3 measured the sustained overlapped pipeline at 249 img/s vs a 378
img/s transfer bound (overlap efficiency 0.66) and hypothesized that the
tunnel serializes transfer RPCs with step dispatch.  This script separates
the mechanisms with direct timings:

  put_idle        device_put of the full uint8 canvas batch, device idle
  put_during_step device_put issued while a train step is executing —
                  if the tunnel serializes RPCs, this inflates by the
                  step's wall time; PCIe DMA would not
  put_chunked     the same batch as N concurrent per-chunk device_puts
                  from a thread pool — does RPC pipelining recover link
                  bandwidth?
  put_chunk_seq   sequential chunked puts (chunking overhead alone)

APPENDS a run to bench_artifacts/transfer_overlap.json (one entry per
observed link regime — the verdict turned out to be link-state-dependent:
on a healthy tunnel threaded puts lose 0.74x, on a degraded one they win
1.46x; see BENCHLOG round 4).  Each run carries its own verdict: whether a
chunked/async feeder beats the current device_prefetch, or the
serialization is in the tunnel itself (environment artifact — a real TPU
host feeds over PCIe DMA).
"""

import argparse
import concurrent.futures as cf
import json
import os
import time

import numpy as np


def append_run(out_path, batch_mb, run):
    """Append a run to the multi-run artifact, converting the legacy
    single-run format ({cases, verdict} at top level) if present.

    batch_mb is stored PER RUN (ADVICE r4: the top-level value went stale
    when a later run measured a different --microbatch); the top-level key
    is kept for old consumers but always reflects the newest run."""
    art = {"batch_mb": batch_mb, "runs": []}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        if "runs" in prev:
            art = prev
            art["batch_mb"] = batch_mb
        elif "cases" in prev:  # legacy single-run format
            legacy = {"label": "legacy", "cases": prev["cases"]}
            if "verdict" in prev:
                legacy["verdict"] = prev["verdict"]
            if "batch_mb" in prev:
                legacy["batch_mb"] = prev["batch_mb"]
            art["runs"] = [legacy]
    run = dict(run)
    run.setdefault("batch_mb", batch_mb)
    art["runs"].append(run)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    return art


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--microbatch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--out", default="bench_artifacts/transfer_overlap.json")
    ap.add_argument("--label", default=None,
                    help="run label (default: derived from idle put MB/s)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
    from peclr_tpu.train.recipe import build_pretrain_state, synthetic_pretrain_batch
    from peclr_tpu.train.step import make_peclr_train_step

    global_batch = args.microbatch * args.accum
    host_batch = {
        k: np.asarray(v)
        for k, v in synthetic_pretrain_batch(global_batch, canvas=224).items()
    }
    batch_mb = sum(v.nbytes for v in host_batch.values()) / 1e6

    model, state, tx = build_pretrain_state(
        resnet="50", batch=args.microbatch, accum=args.accum
    )
    step = make_peclr_train_step(
        model, tx, peclr_pretrain_flags(), AugmentationParams(),
        accum=args.accum, with_stats=False, donate=False,
    )
    key = jax.random.PRNGKey(0)
    dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
    # compile + warm
    s, m = step(state, dev_batch, key)
    s, m = step(s, dev_batch, key)
    float(m["loss"])

    def put_full():
        t0 = time.perf_counter()
        moved = jax.device_put(host_batch)
        jax.block_until_ready(moved)
        # force materialization: read one byte back
        _ = np.asarray(moved["image"][:1, :1, :1])
        return time.perf_counter() - t0

    def put_chunks(workers):
        imgs = host_batch["image"]
        parts = np.array_split(np.arange(len(imgs)), args.chunks)
        t0 = time.perf_counter()
        if workers > 1:
            with cf.ThreadPoolExecutor(workers) as ex:
                moved = list(ex.map(
                    lambda p: jax.device_put(imgs[p[0]: p[-1] + 1]), parts
                ))
        else:
            moved = [jax.device_put(imgs[p[0]: p[-1] + 1]) for p in parts]
        jax.block_until_ready(moved)
        _ = np.asarray(moved[-1][:1, :1, :1])
        return time.perf_counter() - t0

    results = {"batch_mb": round(batch_mb, 1), "cases": {}}

    def record(name, seconds):
        results["cases"][name] = {
            "s": round(seconds, 3),
            "MB_s": round(batch_mb / seconds, 1),
            "img_s": round(global_batch / seconds, 1),
        }
        print(f"{name:18s} {seconds:7.3f} s  {batch_mb/seconds:6.1f} MB/s  "
              f"{global_batch/seconds:6.0f} img/s")

    record("put_idle", float(np.median([put_full() for _ in range(args.iters)])))
    record("put_chunk_seq", float(np.median(
        [put_chunks(1) for _ in range(args.iters)])))
    record("put_chunk_par4", float(np.median(
        [put_chunks(4) for _ in range(args.iters)])))
    record("put_chunk_par8", float(np.median(
        [put_chunks(8) for _ in range(args.iters)])))

    # ---- put while a step is in flight ----------------------------------
    # dispatch a (non-donating) step, then immediately device_put; if the
    # put completes in ~put_idle the tunnel overlaps transfer with compute,
    # if it takes ~put_idle + step_time the RPCs are serialized.  Medianed
    # over --iters like every other case — a single tunnel-RPC hiccup must
    # not decide the serialization verdict.
    dispatch_ss, put_ss, step_walls = [], [], []
    for i in range(args.iters):
        t0 = time.perf_counter()
        s2, m2 = step(s, dev_batch, jax.random.fold_in(key, 9 + i))
        dispatch_ss.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        put_ss.append(put_full())
        float(m2["loss"])
        step_walls.append(time.perf_counter() - t0)
    dispatch_s = float(np.median(dispatch_ss))
    put_s = float(np.median(put_ss))
    step_wall = float(np.median(step_walls))
    results["cases"]["put_during_step"] = {
        "dispatch_s": round(dispatch_s, 3),
        "put_s": round(put_s, 3),
        "put_plus_step_s": round(step_wall, 3),
        "put_s_all": [round(t, 3) for t in put_ss],
    }
    print(f"put_during_step    put {put_s:.3f} s (idle "
          f"{results['cases']['put_idle']['s']:.3f}) — dispatch took "
          f"{dispatch_s:.3f} s")

    idle = results["cases"]["put_idle"]["s"]
    inflation = put_s / idle
    results["verdict"] = {
        "put_inflation_during_step": round(inflation, 2),
        "parallel_put_speedup": round(
            results["cases"]["put_chunk_seq"]["s"]
            / results["cases"]["put_chunk_par8"]["s"], 2),
    }
    label = args.label or (
        f"idle {results['cases']['put_idle']['MB_s']} MB/s"
    )
    run = {"label": label, "cases": results["cases"],
           "verdict": results["verdict"]}
    art = append_run(args.out, results["batch_mb"], run)
    print(f"appended run '{label}' -> {args.out} "
          f"({len(art['runs'])} runs total)")


if __name__ == "__main__":
    main()
