"""Parameterized profiler for the PeCLR train step on the current backend.

One script replaces the round-1 profile_step{,2..5} scraps; the measurement
history lives in BENCHLOG.md.

Usage:
  python scripts/profile_step.py                      # real step, recipe cfg
  python scripts/profile_step.py --batch 256 --accum 1
  python scripts/profile_step.py --ablate noaug,adam,stats,augonly
  python scripts/profile_step.py --trace /tmp/xplane  # jax.profiler trace
  python scripts/profile_step.py --phase finetune     # RN25D 224^2 step
  python scripts/profile_step.py --phase pred         # two-pass inference

Measurement rule (CLAUDE.md): on the tunneled TPU backend only
data-dependent chains report true device time, so every variant chains
state -> state (or output -> input) across iterations.
"""

import argparse
import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.config.defaults import (
    AugmentationFlags,
    AugmentationParams,
    peclr_pretrain_flags,
)
from peclr_tpu.ops.augment import augment_pair
from peclr_tpu.train.recipe import (
    build_pretrain_state,
    synthetic_pretrain_batch,
    synthetic_supervised_batch,
)
from peclr_tpu.train.step import make_peclr_train_step


def chain_time(step, state, batch, key, iters, trace=None):
    """Time `iters` state-chained steps (compile + warmup excluded).

    When `trace` is given the profiler window opens AFTER warmup so it holds
    exactly `iters` steps — the queue-3 traces wrapped warmup too, which
    inflated every TRACE_STEPS-normalized per-step figure by (iters+2)/iters
    (corrected numbers in BENCHLOG round 4)."""
    s, _ = step(state, batch, jax.random.fold_in(key, 0))
    s, m = step(s, batch, jax.random.fold_in(key, 1))
    jax.block_until_ready(m["loss"])
    ctx = jax.profiler.trace(trace) if trace else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for i in range(iters):
            s, m = step(s, batch, jax.random.fold_in(key, 2 + i))
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
    return dt / iters


def build(batch, accum, optimizer="LARS", with_stats=False, flags=None,
          resnet="50"):
    model, state, tx = build_pretrain_state(
        batch=batch, accum=accum, optimizer=optimizer, resnet=resnet,
    )
    step = make_peclr_train_step(
        model, tx, flags or peclr_pretrain_flags(), AugmentationParams(),
        accum=accum, with_stats=with_stats, donate=False,
    )
    return state, step


def run_finetune(args):
    """Supervised RN25D fine-tune step (224x224, bf16 — the published
    fine-tune/eval resolution, README.md:102-122) with the same chained
    measurement + optional trace as the pretrain phase."""
    from peclr_tpu.models import RN25DPose
    from peclr_tpu.train.finetune import make_finetune_step
    from peclr_tpu.train.optimizer import build_optimizer
    from peclr_tpu.train.state import TrainState

    crop = 224
    model = RN25DPose(size=args.resnet, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3)), train=False
    )
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-4, batch_size=args.batch, accum=1,
        steps_per_epoch=1000, epochs=100, optimizer="adam",
    )
    state = TrainState.create(variables, tx)
    flags = AugmentationFlags(crop=True, resize=True)
    step = make_finetune_step(
        model, tx, flags, AugmentationParams(resize_shape=(crop, crop)),
        donate=False,
    )
    batch = synthetic_supervised_batch(args.batch)
    key = jax.random.PRNGKey(0)
    dt = chain_time(step, state, batch, key, args.iters, trace=args.trace)
    if args.trace:
        print(f"xplane trace -> {args.trace}")
    print(f"finetune {dt * 1e3:8.2f} ms/step   {args.batch / dt:8.0f} img/s")
    return dt


def run_pred(args):
    """Two-pass leaderboard predictor (eval/pred_fh.py), output->input
    chained (the kp3d feeds a zero-valued perturbation of the next input so
    dispatches cannot overlap — CLAUDE.md tunnel measurement rule)."""
    from peclr_tpu.eval.pred_fh import make_two_pass_predictor
    from peclr_tpu.models import RN25DPose

    model = RN25DPose(size=args.resnet, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    predict = make_two_pass_predictor(model, variables)
    batch = synthetic_supervised_batch(args.batch)
    imgs, K = batch["image"], jnp.asarray(batch["K"])

    def chained(imgs, n):
        for i in range(n):
            kp3d = predict(imgs, K)
            nz = (jnp.abs(kp3d).sum() * 1e-12).astype(jnp.uint8)
            imgs = imgs + nz  # data dependency; adds exactly 0
        return imgs

    out = chained(imgs, 2)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    if args.trace:
        with jax.profiler.trace(args.trace):
            out = chained(out, args.iters)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"xplane trace -> {args.trace}")
    else:
        out = chained(out, args.iters)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
    print(f"pred     {dt * 1e3:8.2f} ms/step   {args.batch / dt:8.0f} img/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="pretrain",
                    choices=["pretrain", "finetune", "pred"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--ablate", default="",
        help="comma list: noaug (disable all augmentation flags), "
        "adam (optimizer=adam), stats (with_stats=True), "
        "augonly (augment_pair alone, output-chained)",
    )
    ap.add_argument("--trace", default=None, help="xplane trace dir")
    ap.add_argument("--resnet", default="50",
                    help="encoder size for the full/adam/stats variants")
    args = ap.parse_args()

    if args.phase == "finetune":
        return run_finetune(args)
    if args.phase == "pred":
        return run_pred(args)

    n = args.batch * args.accum
    batch = synthetic_pretrain_batch(n)
    key = jax.random.PRNGKey(0)
    variants = [("full", {})]
    for name in filter(None, args.ablate.split(",")):
        if name == "noaug":
            import dataclasses

            f = peclr_pretrain_flags()
            off = {fld.name: False for fld in dataclasses.fields(f)}
            variants.append(("noaug", {"flags": type(f)(**off)}))
        elif name == "adam":
            variants.append(("adam", {"optimizer": "adam"}))
        elif name == "stats":
            variants.append(("stats", {"with_stats": True}))
        elif name == "augonly":
            variants.append(("augonly", None))
        else:
            raise SystemExit(f"unknown ablation: {name}")

    for name, overrides in variants:
        if overrides is None:  # augonly: chain view1 -> next input
            flags, aug = peclr_pretrain_flags(), AugmentationParams()

            @jax.jit
            def aug_only(images, joints, k):
                v1, v2 = augment_pair(k, images, joints, flags, aug)
                return v1.images, v2.images

            img = batch["image"][: args.batch]
            j = batch["joints25d"][: args.batch]
            v1, _ = aug_only(img, j, key)
            jax.block_until_ready(v1)
            t0 = time.perf_counter()
            for i in range(args.iters):
                carry = jnp.round(v1[:, :224, :224] if v1.shape[1] >= 224
                                  else jnp.pad(v1, ((0, 0), (0, 224 - v1.shape[1]),
                                                    (0, 224 - v1.shape[2]), (0, 0))))
                v1, _ = aug_only(carry.astype(jnp.uint8), j,
                                 jax.random.fold_in(key, i))
            jax.block_until_ready(v1)
            dt = (time.perf_counter() - t0) / args.iters
        else:
            state, step = build(args.batch, args.accum, resnet=args.resnet,
                                **overrides)
            trace = args.trace if name == "full" else None
            dt = chain_time(step, state, batch, key, args.iters, trace=trace)
            if trace:
                print(f"xplane trace -> {args.trace}")
        print(f"{name:8s} {dt * 1e3:8.2f} ms/step   {n / dt:8.0f} img/s")


if __name__ == "__main__":
    main()
