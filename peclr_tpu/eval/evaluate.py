"""Full-dataset evaluation for the supervised / fine-tuned models.

Equivalent of the reference `evaluate` (evaluation_utils.py:82-227): run
inference over a dataset, lift 2.5D predictions to 3D with the closed-form
z-root, and report EPE 2D/3D, AUC, the recreated-3D sanity metric and
procrustes-aligned statistics.  Inference is batched and jitted (the
reference loops a DataLoader sample-by-sample on one GPU).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.eval.metrics import (
    auc,
    epe_statistics,
    procrustes_statistics,
)
from peclr_tpu.geometry.camera import convert_2_5d_to_3d, convert_to_2_5d
from peclr_tpu.ops.augment import augment_batch
from peclr_tpu.ops.image import normalize_imagenet
from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams


def supervised_sample_batch(
    key, batch, flags: AugmentationFlags, params: AugmentationParams,
    use_palm: bool = False,
):
    """Device-side supervised sample prep (reference
    prepare_supervised_sample, data_set.py:278-329): one augmented view,
    K' = T @ K propagation, 2.5D labels in crop coordinates, recreated-3D
    self-check targets.  With `use_palm`, the wrist is replaced by the palm
    midpoint and the 2.5D labels are re-projected through K'."""
    out = augment_batch(key, batch["image"], batch["joints25d"], flags, params)
    K_new = jnp.einsum("bij,bjk->bik", out.matrix, batch["K"])
    joints3d = batch["joints3d"]
    scale = batch["scale"]
    joints25d = out.joints
    joints_raw = batch.get("joints_raw", joints3d)
    if use_palm:
        from peclr_tpu.geometry.camera import move_wrist_to_palm

        joints3d = move_wrist_to_palm(joints3d)
        joints25d, scale = convert_to_2_5d(K_new, joints3d)
        # the procrustes targets move too (data_set.py:313-314)
        joints_raw = move_wrist_to_palm(joints_raw)
    joints3d_recreated = convert_2_5d_to_3d(joints25d, scale, K_new)
    return {
        "image": normalize_imagenet(out.images),
        "joints": joints25d,
        "joints3D": joints3d,
        "K": K_new,
        "scale": scale,
        "joints3D_recreated": joints3d_recreated,
        "joints_valid": batch["joints_valid"],
        "joints_raw": joints_raw,
        "T": out.matrix,
    }


def collect_predictions(
    predict_25d: Callable,
    pipeline,
    flags: AugmentationFlags,
    aug_params: AugmentationParams,
    num_batches: Optional[int] = None,
    seed: int = 0,
    use_palm: bool = False,
) -> Dict[str, np.ndarray]:
    """Run batched inference; returns stacked predictions + ground truth.

    predict_25d(images, K) -> (B, 21, 3) 2.5D predictions (jitted outside).
    With `use_palm`, labels AND the procrustes targets (joints_raw) are
    palm-moved (data_set.py:305-314).
    """
    n = num_batches or max(len(pipeline) // pipeline.batch_size, 1)
    key = jax.random.PRNGKey(seed)
    preds, gts, gt3d, gt3d_rec, scales, Ks, raws = [], [], [], [], [], [], []
    for i, raw_batch in enumerate(pipeline.batches(n, epoch=0)):
        batch = {k: jnp.asarray(v) for k, v in raw_batch.items()}
        sample = supervised_sample_batch(
            jax.random.fold_in(key, i), batch, flags, aug_params,
            use_palm=use_palm,
        )
        pred = predict_25d(sample["image"], sample["K"])
        preds.append(np.asarray(pred))
        gts.append(np.asarray(sample["joints"]))
        gt3d.append(np.asarray(sample["joints3D"]))
        gt3d_rec.append(np.asarray(sample["joints3D_recreated"]))
        scales.append(np.asarray(sample["scale"]))
        Ks.append(np.asarray(sample["K"]))
        raws.append(np.asarray(sample["joints_raw"]))
    return {
        "predictions": np.concatenate(preds),
        "ground_truth": np.concatenate(gts),
        "ground_truth_3d": np.concatenate(gt3d),
        "ground_truth_recreated_3d": np.concatenate(gt3d_rec),
        "scale": np.concatenate(scales),
        "camera_param": np.concatenate(Ks),
        "joints_raw": np.concatenate(raws),
    }


def evaluate(
    predict_25d: Callable,
    pipeline,
    flags: Optional[AugmentationFlags] = None,
    aug_params: Optional[AugmentationParams] = None,
    use_procrustes: bool = True,
    num_batches: Optional[int] = None,
    predict_zroot: Optional[Callable] = None,
    use_palm: bool = False,
) -> Dict[str, float]:
    """EPE/AUC evaluation dict (keys mirror evaluation_utils.evaluate).

    `predict_zroot(pred_25d, K) -> (N,)` optionally supplies a denoised
    z-root that overrides the closed-form lift (the reference's denoiser
    path, evaluation_utils.py:133-140, 199-212)."""
    flags = flags or AugmentationFlags(resize=True, crop=True)
    aug_params = aug_params or AugmentationParams(resize_shape=(128, 128))
    pred = collect_predictions(
        predict_25d, pipeline, flags, aug_params, num_batches,
        use_palm=use_palm,
    )
    z_root = None
    if predict_zroot is not None:
        z_root = predict_zroot(
            jnp.asarray(pred["predictions"]), jnp.asarray(pred["camera_param"])
        )
    predictions_3d = np.asarray(
        convert_2_5d_to_3d(
            jnp.asarray(pred["predictions"]),
            jnp.asarray(pred["scale"]),
            jnp.asarray(pred["camera_param"]),
            z_root=z_root,
        )
    )
    epe_2d = epe_statistics(pred["predictions"], pred["ground_truth"], dim=2)
    epe_3d = epe_statistics(predictions_3d, pred["ground_truth_3d"], dim=3)
    epe_rec = epe_statistics(
        pred["ground_truth_3d"], pred["ground_truth_recreated_3d"], dim=3
    )
    results = {
        "Mean_EPE_2D": float(epe_2d["mean"]),
        "Median_EPE_2D": float(epe_2d["median"]),
        "Mean_EPE_3D": float(epe_3d["mean"]),
        "Median_EPE_3D": float(epe_3d["median"]),
        "Median_EPE_3D_R_V_3D": float(epe_rec["median"]),
        "AUC": auc(epe_3d["euclidean_dist"]),
    }
    if use_procrustes:
        results.update(
            procrustes_statistics(predictions_3d, pred["joints_raw"])
        )
    return results
