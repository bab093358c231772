"""Benchmark: aug+train images/sec/chip for the RN50 PeCLR pretrain step.

Runs the full jitted step — device-side augmentation (fused warp + color
jitter), ResNet encoder + projection head in bf16, equivariant NT-Xent,
LARS/Adam update — on one chip with data resident in HBM (host decode is
overlapped in production and benchmarked separately).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 4,000 aug+train images/sec/chip for the RN50 recipe
(BASELINE.md north star, set for TPU v4 hardware — see BENCHLOG.md for the
v5e speed-of-light ceiling analysis).
"""

import json
import os
import sys
import time

BASELINE_IMG_PER_SEC = 4000.0


def main():
    # default = the published PeCLR recipe: microbatch 128 x grad-accum 16
    # (effective 2048) — grad accumulation amortizes the optimizer and is
    # the fastest measured configuration
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    accum = int(os.environ.get("BENCH_ACCUM", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    windows = int(os.environ.get("BENCH_WINDOWS", "3"))
    resnet = os.environ.get("BENCH_RESNET", "50")
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
    )

    from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
    from peclr_tpu.train.recipe import build_pretrain_state, synthetic_pretrain_batch
    from peclr_tpu.train.step import make_peclr_train_step

    model, state, tx = build_pretrain_state(resnet=resnet, batch=batch, accum=accum)

    flags = peclr_pretrain_flags()
    aug = AugmentationParams()  # 224 canvas -> 128x128 views
    # BENCH_COMPILER_OPTIONS (JSON) overrides the production default
    # (train/step.py DEFAULT_TPU_COMPILER_OPTIONS) for A/B sweeps
    opts = os.environ.get("BENCH_COMPILER_OPTIONS")
    step = make_peclr_train_step(
        model, tx, flags, aug, accum=accum, unroll=unroll, with_stats=False,
        donate=True, compiler_options=json.loads(opts) if opts else "auto",
        stats_accum=os.environ.get("BENCH_STATS_ACCUM", "outside"),
    )

    batch_dict = synthetic_pretrain_batch(batch * accum)

    key = jax.random.PRNGKey(0)
    # warmup / compile
    for i in range(3):
        state, metrics = step(state, batch_dict, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])

    # Time BENCH_WINDOWS independent dependency-chained windows and report
    # the best: every step is chained state->state (required on the tunnel,
    # see CLAUDE.md), so external interference — tunnel RPC hiccups, host
    # jitter — can only ADD time to a window.  The fastest window is the
    # least-contaminated measurement of the same fixed program (documented
    # run-to-run spread across days is ~0.6-1%).
    best_dt = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(
                state, batch_dict, jax.random.fold_in(key, 100 + w * iters + i)
            )
        jax.block_until_ready(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    img_per_sec = batch * accum * iters / best_dt
    print(
        json.dumps(
            {
                "metric": f"aug+train images/sec/chip (RN{resnet} PeCLR, "
                f"microbatch {batch} x accum {accum}, bf16)",
                "value": round(img_per_sec, 1),
                "unit": "images/sec/chip",
                # the 4,000 north star is the RN50 recipe's target; other
                # BENCH_RESNET selections have no published baseline
                "vs_baseline": (
                    round(img_per_sec / BASELINE_IMG_PER_SEC, 3)
                    if resnet == "50" else None
                ),
                # estimator methodology (ADVICE r4): min-of-W windows of N
                # chained iters, adopted round 4 — best-window readings are
                # ~0.3-1% above the round-<=3 single-window numbers; compare
                # like with like (BENCHLOG "estimator" note)
                "estimator": f"min_of_{windows}_windows_x_{iters}_iters",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
