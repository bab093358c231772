"""Perf regression guard: pin the frozen-by-argument single-chip numbers
(VERDICT r4 next #5).

Round 4 closed the single-chip perf argument (the remaining ~11% gap to
this v5e's own speed-of-light floor is irreducible on this toolchain), so
nothing would fail if a refactor silently regressed throughput — the trace
tests pin OLD traces, not new runs.  This script re-measures all four
phases on the real chip in one serial queue with the same chained-dispatch
estimator as BENCHLOG's tables (min over windows of state->state chained
iters), asserts each against the committed same-session REFERENCE with the
documented day-spread band, and writes bench_artifacts/bench_guard.json
stamped with a hash of the device hot-path sources.  CI
(tests/test_bench_artifacts.py::TestBenchGuard) asserts the artifact's
verdict AND its freshness: if any hot-path file changed since the guard
last ran, the committed artifact goes stale and the suite says so.

Run (real TPU, serial — never alongside another TPU process):
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/bench_guard.py
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # 'python scripts/bench_guard.py' must find peclr_tpu

# References (BENCHLOG round-4 serial queue, chained-dispatch estimator)
# with PER-PHASE acceptance bands (measured >= band * reference):
#  * pretrain phases (0.5-1 s steps) amortize the tunnel's per-dispatch
#    RPC gap -> day spread ~0.6%, band 0.98;
#  * finetune/pred (~50/25 ms steps) are wall = device busy + tunnel gap,
#    and the GAP swings by several ms across days while busy does not
#    (round-5 check: finetune wall 53.0 -> 54-55.5 ms across sessions with
#    device self time 48.9 ms in BOTH the r4 and a fresh r5 trace, floor
#    43.9 identical; pred's gap collapsed 24.9 -> 4.7 ms the same day)
#    -> band 0.90 covers the gap swing on a ~50 ms step; `busy_ms` is the
#    trace-anchored device time recorded for gap diagnosis.
REFERENCE = {
    "pretrain_rn50": {"img_s": 3907.0, "band": 0.98},
    "pretrain_rn152": {"img_s": 2072.6, "band": 0.98},
    "finetune": {"img_s": 2413.0, "band": 0.90, "busy_ms": 48.9},
    "pred": {"img_s": 2670.0, "band": 0.90, "busy_ms": 23.0},
}

# The device hot path: any change here invalidates the committed guard
# artifact (CI recomputes this hash over the working tree).
HOT_PATHS = [
    "peclr_tpu/ops",
    "peclr_tpu/losses",
    "peclr_tpu/models/resnet.py",
    "peclr_tpu/models/peclr.py",
    "peclr_tpu/models/rn25d.py",
    "peclr_tpu/models/heads.py",
    "peclr_tpu/train/step.py",
    "peclr_tpu/train/finetune.py",
    "peclr_tpu/train/optimizer.py",
    "peclr_tpu/train/state.py",
    "peclr_tpu/train/recipe.py",
    "peclr_tpu/eval/pred_fh.py",
]


def hot_path_hash(repo: str = REPO) -> str:
    """sha256 over the sorted (relpath, contents) of every hot-path .py."""
    files = []
    for p in HOT_PATHS:
        full = os.path.join(repo, p)
        if os.path.isdir(full):
            for root, _, names in os.walk(full):
                files += [os.path.join(root, n) for n in names
                          if n.endswith(".py")]
        elif os.path.exists(full):
            files.append(full)
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(os.path.relpath(f, repo).encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def measure_phases(iters: int, windows: int):
    """All four phases, serial, chained dispatch; returns {phase: img/s}."""
    import jax

    import profile_step as ps

    results = {}

    def best(run_once):
        dts = [run_once() for _ in range(windows)]
        return min(dts)

    # -- pretrain recipes (microbatch 128 x accum 16) ----------------------
    from peclr_tpu.train.recipe import synthetic_pretrain_batch

    batch = synthetic_pretrain_batch(128 * 16)
    key = jax.random.PRNGKey(0)
    for name, resnet in (("pretrain_rn50", "50"), ("pretrain_rn152", "152")):
        state, step = ps.build(128, 16, resnet=resnet)
        dt = best(lambda: ps.chain_time(step, state, batch, key, iters))
        results[name] = 128 * 16 / dt
        print(f"{name}: {results[name]:.1f} img/s ({dt * 1e3:.1f} ms/step)")
        del state, step

    # -- finetune + two-pass predictor (batch 128, 224^2) ------------------
    ns = argparse.Namespace(batch=128, iters=iters, trace=None, resnet="50")
    dt = best(lambda: ps.run_finetune(ns))
    results["finetune"] = 128 / dt
    print(f"finetune: {results['finetune']:.1f} img/s")
    dt = best(lambda: ps.run_pred(ns))
    results["pred"] = 128 / dt
    print(f"pred: {results['pred']:.1f} img/s")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--out", default="bench_artifacts/bench_guard.json")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
    )
    backend = jax.default_backend()

    t0 = time.time()
    measured = measure_phases(args.iters, args.windows)

    batch_per_step = {"pretrain_rn50": 2048, "pretrain_rn152": 2048,
                      "finetune": 128, "pred": 128}
    phases = {}
    for name, ref in REFERENCE.items():
        got = measured[name]
        phases[name] = {
            "img_per_sec": round(got, 1),
            "reference_img_per_sec": ref["img_s"],
            "band": ref["band"],
            "ratio": round(got / ref["img_s"], 4),
            "pass": bool(got >= ref["band"] * ref["img_s"]),
        }
        if "busy_ms" in ref:  # dispatch-gap diagnosis for small-step phases
            wall_ms = batch_per_step[name] / got * 1e3
            phases[name]["wall_ms"] = round(wall_ms, 2)
            phases[name]["trace_busy_ms"] = ref["busy_ms"]
            phases[name]["implied_gap_ms"] = round(wall_ms - ref["busy_ms"], 2)
    record = {
        "backend": backend,
        "estimator": f"min_of_{args.windows}_windows_x_{args.iters}_iters",
        "hot_path_hash": hot_path_hash(),
        "git_head": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True,
            text=True,
        ).stdout.strip(),
        "elapsed_s": round(time.time() - t0, 1),
        "phases": phases,
        "ok": all(p["pass"] for p in phases.values()),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({k: record[k] for k in ("ok", "phases")}, indent=1))
    if not record["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
