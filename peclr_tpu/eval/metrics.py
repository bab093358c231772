"""Evaluation metrics: EPE statistics, PCK curves, per-joint AUC, and
procrustes-aligned variants.

Semantics match the reference evaluation suite
(src/experiments/evaluation_utils.py:13-54, 230-301): PCK thresholds run
0 -> 0.5 m in 5 mm steps; AUC is the trapezoid integral of the per-joint PCK
curve normalized by the threshold span, averaged over the 21 joints.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from peclr_tpu.geometry.procrustes import procrustes_align


def epe_statistics(predictions, ground_truth, dim: int = 3) -> Dict:
    """Euclidean distance stats.  dim=2 uses only the first two coords."""
    if dim == 2:
        predictions = predictions[..., :2]
        ground_truth = ground_truth[..., :2]
    dist = jnp.sqrt(jnp.sum((predictions - ground_truth) ** 2, axis=-1))
    return {
        "euclidean_dist": dist,
        "mean": jnp.mean(dist),
        "median": jnp.median(dist),
        "min": jnp.min(dist),
        "max": jnp.max(dist),
    }


def pck_curve(
    euclidean_dist,
    threshold_min: float = 0.0,
    threshold_max: float = 0.5,
    step: float = 0.005,
    per_joint: bool = False,
):
    """Fraction of keypoints under each threshold.

    euclidean_dist: (N, 21).  Returns (curve, thresholds); curve is
    (T,) or (21, T) when per_joint.
    """
    dist = np.asarray(euclidean_dist)
    thresholds = np.arange(threshold_min, threshold_max, step)
    # (N, 21, T) would be large; compute via broadcasting on (N*21, T)
    if per_joint:
        curve = np.stack(
            [(dist < t).mean(axis=0) for t in thresholds], axis=-1
        )  # (21, T)
    else:
        curve = np.array([(dist < t).mean() for t in thresholds])
    return curve, thresholds


def auc_per_joint(euclidean_dist) -> np.ndarray:
    """Normalized trapezoid AUC of the PCK curve for each joint."""
    curve, thresholds = pck_curve(euclidean_dist, per_joint=True)
    norm = np.trapezoid(np.ones_like(thresholds), thresholds)
    return np.array(
        [np.trapezoid(curve[j], thresholds) / norm for j in range(curve.shape[0])]
    )


def auc(euclidean_dist) -> float:
    return float(np.mean(auc_per_joint(euclidean_dist)))


def procrustes_statistics(predictions_3d, joints_raw) -> Dict[str, float]:
    """Aligned EPE/AUC after per-sample similarity alignment — the
    leaderboard's 'aligned' numbers."""
    aligned, _, _, _ = procrustes_align(
        jnp.asarray(joints_raw), jnp.asarray(predictions_3d)
    )
    stats = epe_statistics(aligned, jnp.asarray(joints_raw), dim=3)
    return {
        "Mean_EPE_3D_procrustes": float(stats["mean"]),
        "Median_EPE_3D_procrustes": float(stats["median"]),
        "auc_procrustes": auc(stats["euclidean_dist"]),
    }
