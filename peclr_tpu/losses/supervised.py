"""Supervised 2.5D / 3D keypoint losses and EPE metrics.

Semantics match the reference (src/models/utils.py:20-104): validity-weighted
L1 with the 2D and relative-depth terms separated, plus a lifted-3D MAE using
the closed-form z-root, and mean/median end-point-error metrics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from peclr_tpu.geometry.camera import convert_2_5d_to_3d


def l1_loss_25d(
    pred_joints, true_joints, scale=None, joints_valid=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Validity-weighted L1 between 2.5D predictions and targets.

    pred/true: (B, 21, 3); scale: (B,); joints_valid: (B, 21, 1) or None.
    Returns (loss_2d, loss_z, loss_z_unscaled): the uv loss (averaged over
    its two coordinates), the scale-normalized z loss, and the z loss
    multiplied back to metric units.
    """
    if joints_valid is None:
        joints_valid = jnp.ones_like(true_joints[..., -1:])
    weight = joints_valid / jnp.sum(joints_valid)
    abs_err = jnp.abs(pred_joints - true_joints)
    loss_2d = jnp.sum(abs_err[..., :2] * weight) / 2.0
    loss_z_elem = abs_err[..., 2:] * weight
    if scale is None:
        loss_z_unscaled = jnp.sum(loss_z_elem)
    else:
        loss_z_unscaled = jnp.sum(loss_z_elem * scale.reshape(-1, 1, 1))
    loss_z = jnp.sum(loss_z_elem)
    return loss_2d, loss_z, loss_z_unscaled


def loss_3d(
    pred_25d,
    joints3d_gt,
    scale,
    K,
    joints_valid=None,
    z_root: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Validity-weighted MAE between lifted 3D predictions and ground truth
    (per-coordinate sum / 3)."""
    pred_3d = convert_2_5d_to_3d(pred_25d, scale, K, z_root=z_root)
    if joints_valid is None:
        joints_valid = jnp.ones_like(joints3d_gt[..., -1:])
    weight = joints_valid / jnp.sum(joints_valid)
    return jnp.sum(jnp.abs(pred_3d - joints3d_gt) * weight) / 3.0


def epe_metrics(y_pred, y_true, prefix: str = "train"):
    """Mean/median euclidean end-point error over all joints
    (reference calculate_metrics, models/utils.py:53-73)."""
    dist = jnp.sqrt(jnp.sum((y_pred - y_true) ** 2, axis=-1))
    return {
        f"EPE_mean_{prefix}": jnp.mean(dist),
        f"EPE_median_{prefix}": jnp.median(dist),
    }
