"""Accuracy-parity proxy: PeCLR (equivariant) vs SimCLR (invariant) on
synthetic hand data, judged by a frozen-encoder linear probe for 2D
keypoints.

The real FreiHAND/YT3DH data and released weights are unreachable here, so
this is the locally-runnable evidence that the LEARNING semantics are right:
with identical seeds, data, augmentations and optimizer, inverting the
geometric transforms in projection space (the PeCLR contribution,
hybrid2_model.py:27-90) must yield features from which hand pose is more
linearly decodable than the invariant SimCLR baseline.

Writes a JSONL regression artifact (tests/fixtures/accuracy_proxy.jsonl by
default); tests/test_accuracy_proxy.py asserts the committed artifact.

Run on any backend:   python scripts/accuracy_proxy.py
CPU (slow, 1 core):   JAX_PLATFORMS=cpu python scripts/accuracy_proxy.py --steps 60
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np

# ---------------------------------------------------------------------------
# Synthetic hand frames: a 21-joint template under random similarity
# transforms, rendered with per-finger colors so images carry exact pose
# information (the probe's signal).
# ---------------------------------------------------------------------------

_TEMPLATE = None


def hand_template() -> np.ndarray:
    """(21, 2) canonical hand: wrist + 5 fingers x 4 joints, AIT order
    (wrist, 5 mcp, 5 pip, 5 dip, 5 tip)."""
    global _TEMPLATE
    if _TEMPLATE is None:
        wrist = np.array([[0.0, 0.0]])
        angles = np.deg2rad(np.array([-50, -25, 0, 25, 50]))
        dirs = np.stack([np.sin(angles), -np.cos(angles)], axis=1)
        rows = [wrist]
        for r in (0.35, 0.55, 0.72, 0.88):  # mcp, pip, dip, tip rings
            rows.append(dirs * r)
        _TEMPLATE = np.concatenate(rows, axis=0)
    return _TEMPLATE


_BONES = [(0, m) for m in range(1, 6)] + [
    (1 + 5 * k + f, 1 + 5 * (k + 1) + f) for k in range(3) for f in range(5)
]
_FINGER_COLORS = np.array(
    [[255, 60, 60], [60, 255, 60], [60, 60, 255], [255, 255, 60], [255, 60, 255]],
    np.float32,
)


def render_batch(rng: np.random.Generator, n: int, canvas: int = 128):
    """Returns (images uint8 (n, canvas, canvas, 3), joints25d (n, 21, 3))."""
    import cv2

    imgs = np.empty((n, canvas, canvas, 3), np.uint8)
    joints = np.empty((n, 21, 3), np.float32)
    t = hand_template()
    for i in range(n):
        scale = rng.uniform(0.22, 0.38) * canvas
        theta = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -s], [s, c]])
        center = rng.uniform(0.3, 0.7, 2) * canvas
        pts = t @ rot.T * scale + center
        img = (rng.integers(0, 60, (canvas, canvas, 3))).astype(np.uint8)
        for a, b in _BONES:
            fid = (max(a, b) - 1) % 5
            col = tuple(int(v) for v in _FINGER_COLORS[fid])
            cv2.line(img, tuple(np.round(pts[a]).astype(int)),
                     tuple(np.round(pts[b]).astype(int)), col, 2)
        for j, p in enumerate(pts):
            col = (255, 255, 255) if j == 0 else tuple(
                int(v) for v in _FINGER_COLORS[(j - 1) % 5]
            )
            cv2.circle(img, tuple(np.round(p).astype(int)), 2, col, -1)
        imgs[i] = img
        joints[i, :, :2] = pts
        joints[i, :, 2] = 0.0
    return imgs, joints


# ---------------------------------------------------------------------------


def pretrain(kind: str, imgs, joints, steps: int, batch: int, seed: int,
             view: int, resnet: str, accum: int = 1, optimizer: str = "adam",
             lr: float = 5e-5, probe_hook=None, probe_every: int = 0):
    """Pretrain one model; returns embeddings fn (params frozen).

    With accum/optimizer this scales to the published recipe shape
    (microbatch 128 x accum 16, LARS — README.md:49-57).  `probe_hook`
    (if given) is called with (step_index, embed_fn) every `probe_every`
    steps to record a learning curve."""
    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
    from peclr_tpu.models import PeCLRModel
    from peclr_tpu.ops import image as im
    from peclr_tpu.train.optimizer import build_optimizer
    from peclr_tpu.train.state import TrainState
    from peclr_tpu.train.step import make_peclr_train_step

    flags = AugmentationFlags(crop=True, rotate=True, resize=True,
                              color_jitter=True)
    aug = AugmentationParams(resize_shape=(view, view))
    model = PeCLRModel(resnet_size=resnet, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, view, view, 3)), train=False
    )
    # steps_per_epoch counts DATA iterations (microbatches); the loop below
    # runs `steps` optimizer updates of `accum` microbatches each
    tx, _ = build_optimizer(
        variables["params"], base_lr=lr, batch_size=batch, accum=accum,
        steps_per_epoch=steps * accum, epochs=1,
        warmup_epochs=0.05 if optimizer == "LARS" else 0,
        optimizer=optimizer,
    )
    state = TrainState.create(variables, tx)
    # the ONLY difference between the two runs: SimCLR applies no inverse
    # transforms in projection space (cli/train.py simclr experiment type)
    augmentations = () if kind == "simclr" else ("crop", "rotate")
    step = make_peclr_train_step(
        model, tx, flags, aug, accum=accum, augmentations=augmentations,
        with_stats=False, donate=False,
    )

    def make_embed(st):
        @jax.jit
        def embed(images_u8):
            x = im.normalize_imagenet(images_u8.astype(jnp.float32) / 255.0)
            out = model.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                x, train=False,
            )
            return out["embedding"]

        return embed

    key = jax.random.PRNGKey(seed)
    n = imgs.shape[0]
    per_step = batch * accum
    # keep the pool device-resident and gather per-step indices on device:
    # re-shipping the full global batch every step would bottleneck on the
    # host->device link (measured 57 MB/s on this tunnel rig —
    # bench_artifacts/host_pipeline.json), not on training
    imgs_d = jnp.asarray(imgs)
    joints_d = jnp.asarray(joints)
    losses = []
    t0 = time.time()
    if probe_hook and probe_every:
        probe_hook(0, make_embed(state))  # random-init baseline for the curve
    for i in range(steps):
        idx = jnp.asarray(
            np.random.default_rng(1000 * seed + i).integers(0, n, per_step)
        )
        bd = {"image": jnp.take(imgs_d, idx, axis=0),
              "joints25d": jnp.take(joints_d, idx, axis=0)}
        state, m = step(state, bd, jax.random.fold_in(key, i))
        losses.append(m["loss"])  # device scalar; fetched in bulk below
        if probe_hook and probe_every and (i + 1) % probe_every == 0:
            probe_hook(i + 1, make_embed(state))
    losses = [float(l) for l in jax.device_get(losses)]
    print(f"  {kind}: loss {losses[0]:.4f} -> {np.mean(losses[-10:]):.4f} "
          f"({time.time() - t0:.0f}s)")

    return make_embed(state), losses, state


def linear_probe(embed, imgs, joints, view: int, train_n: int, seed: int):
    """Ridge-regress 2D keypoints from frozen embeddings; returns
    {"abs": EPE, "rel": EPE} in canvas pixels.

    "abs" targets absolute canvas coordinates (position + pose — the
    equivariance claim's home turf); "rel" targets wrist-centered
    coordinates (pose only, wrist excluded from the error).  The split
    diagnoses WHERE PeCLR-vs-SimCLR orderings come from: equivariant
    features should carry absolute position that invariant features
    discard, while pure-pose decodability can saturate for both
    (VERDICT r3 #4)."""
    import cv2
    import jax.numpy as jnp

    canvas = imgs.shape[1]
    small = np.stack([cv2.resize(im, (view, view)) for im in imgs])
    feats = []
    for i in range(0, len(small), 256):
        feats.append(np.asarray(embed(jnp.asarray(small[i : i + 256]))))
    f = np.concatenate(feats).astype(np.float64)
    f = (f - f[:train_n].mean(0)) / (f[:train_n].std(0) + 1e-6)
    f = np.concatenate([f, np.ones((len(f), 1))], axis=1)
    ftr = f[:train_n]
    solve_lhs = ftr.T @ ftr + 1e-3 * np.eye(f.shape[1])

    def fit(y):
        w = np.linalg.solve(solve_lhs, ftr.T @ y[:train_n])
        return (f[train_n:] @ w - y[train_n:])

    pts = joints[:, :, :2].astype(np.float64)
    y_abs = pts.reshape(len(f), -1) / canvas
    err = fit(y_abs).reshape(-1, 21, 2) * canvas
    epe_abs = float(np.sqrt((err ** 2).sum(-1)).mean())
    # wrist-centered, wrist (identically 0) excluded from the error
    y_rel = (pts - pts[:, :1]).reshape(len(f), -1) / canvas
    err_rel = fit(y_rel).reshape(-1, 21, 2)[:, 1:] * canvas
    epe_rel = float(np.sqrt((err_rel ** 2).sum(-1)).mean())
    return {"abs": epe_abs, "rel": epe_rel}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-images", type=int, default=2048)
    ap.add_argument("--probe-train", type=int, default=1536)
    ap.add_argument("--view", type=int, default=64)
    ap.add_argument("--resnet", default="18")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "LARS"])
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--probe-every", type=int, default=0,
                    help="record a probe-EPE learning curve every N steps")
    ap.add_argument("--curve-out", default=None,
                    help="JSON path for the learning-curve artifact")
    ap.add_argument("--out", default="tests/fixtures/accuracy_proxy.jsonl")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    imgs, joints = render_batch(rng, args.num_images)
    print(f"synthetic set: {imgs.shape}, probe train {args.probe_train}")

    def write_curves(curves, complete):
        """Dump the curve artifact NOW.  Called after every probe so a
        killed/timed-out run still leaves its measurements on disk (a full
        RN152 recipe-shape run is ~2 h of chip time); `complete` is False
        until the final write — partial artifacts must not be committed."""
        if not args.curve_out:
            return
        os.makedirs(os.path.dirname(args.curve_out) or ".", exist_ok=True)
        with open(args.curve_out, "w") as fh:
            json.dump({
                "config": {k: v for k, v in vars(args).items()
                           if k not in ("out", "curve_out")},
                "backend": __import__("jax").default_backend(),
                "complete": complete,
                "curves": curves,
            }, fh, indent=1)

    results = {}
    curves = {}
    for kind in ("peclr", "simclr"):
        curve = []

        def probe_hook(step_i, embed_fn, kind=kind, curve=curve):
            e = linear_probe(embed_fn, imgs, joints, args.view,
                             args.probe_train, args.seed)
            curve.append({"step": step_i, "probe_epe_px": e["abs"],
                          "probe_epe_rel_px": e["rel"]})
            print(f"  {kind} @ {step_i}: probe EPE {e['abs']:.2f} px "
                  f"(rel {e['rel']:.2f})")
            write_curves({**curves, kind: {"probe": curve}}, complete=False)

        embed, losses, _state = pretrain(
            kind, imgs, joints, args.steps, args.batch, args.seed,
            args.view, args.resnet, accum=args.accum,
            optimizer=args.optimizer, lr=args.lr,
            probe_hook=probe_hook, probe_every=args.probe_every,
        )
        if curve and curve[-1]["step"] == args.steps:
            epe = curve[-1]["probe_epe_px"]  # already probed at the last step
            epe_rel = curve[-1]["probe_epe_rel_px"]
        else:
            e = linear_probe(embed, imgs, joints, args.view,
                             args.probe_train, args.seed)
            epe, epe_rel = e["abs"], e["rel"]
            curve.append({"step": args.steps, "probe_epe_px": epe,
                          "probe_epe_rel_px": epe_rel})
        results[kind] = {"probe_epe_px": epe, "probe_epe_rel_px": epe_rel,
                         "final_loss": float(np.mean(losses[-10:]))}
        stride = max(len(losses) // 200, 1)
        curves[kind] = {
            "probe": curve,
            "loss_steps": list(range(0, len(losses), stride)),
            "loss": [float(np.mean(losses[max(0, i - stride + 1): i + 1]))
                     for i in range(0, len(losses), stride)],
        }
        print(f"  {kind}: probe EPE {epe:.2f} px")

    if args.curve_out:
        write_curves(curves, complete=True)
        print(f"wrote {args.curve_out}")

    record = {
        "config": {k: v for k, v in vars(args).items() if k != "out"},
        "backend": __import__("jax").default_backend(),
        **results,
        "epe_ratio_peclr_over_simclr":
            results["peclr"]["probe_epe_px"] / results["simclr"]["probe_epe_px"],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # Records are keyed by config: a re-run with the same settings replaces
    # its previous record instead of appending a duplicate (a short smoke
    # run can therefore never poison the committed artifact's history).
    existing = []
    if os.path.exists(args.out):
        with open(args.out) as fh:
            existing = [json.loads(l) for l in fh if l.strip()]
    existing = [r for r in existing if r.get("config") != record["config"]]
    existing.append(record)
    with open(args.out, "w") as fh:
        for r in existing:
            fh.write(json.dumps(r) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
