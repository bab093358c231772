"""Equivariant projection-space transforms — the core PeCLR contribution.

The 128-d projection vector is reinterpreted as 64 2-D points; the *inverse*
of each sample's geometric augmentation (crop translation, rotation) is
applied to its projection before the contrastive loss, making the encoder
equivariant rather than invariant to those transforms.

Semantics follow the reference exactly (hybrid2_model.py:27-90,
models/utils.py:271-364): translation is scaled by the detached per-sample
x/y extent of the point cloud; rotation is about the detached centroid using
the OpenCV rotation-matrix convention; all rotation matrices are built
in-graph (the reference builds them on CPU and syncs to device each step —
re-architected away here).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from peclr_tpu.geometry.affine import rotation_about_center


def rotate_projections(points, angle_deg):
    """Rotate (B, M, 2) point clouds by per-sample angles about their
    (detached) centroids, OpenCV convention."""
    center = jax.lax.stop_gradient(jnp.mean(points, axis=1))
    rot = rotation_about_center(angle_deg, center[:, 0], center[:, 1])
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return jnp.einsum("bij,bnj->bni", rot, hom)[..., :2]


def translate_projections(points, tx, ty):
    """Shift x/y by the normalized jitter scaled by the detached per-sample
    extent (max − min) of each axis."""
    ext = jax.lax.stop_gradient(
        jnp.max(points, axis=1) - jnp.min(points, axis=1)
    )
    offset = jnp.stack([tx * ext[:, 0], ty * ext[:, 1]], axis=-1)
    return points + offset[:, None, :]


def translate_projections_exact(points, tx, ty):
    """Exact-shift variant (reference translate_encodings2)."""
    return points + jnp.stack([tx, ty], axis=-1)[:, None, :]


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(
        jnp.clip(jnp.sum(x * x, axis=axis, keepdims=True), min=eps)
    )


def peclr_projections(
    proj1,
    proj2,
    params1: Dict[str, jnp.ndarray],
    params2: Dict[str, jnp.ndarray],
    image_size: Tuple[int, int] = (128, 128),
    augmentations: Sequence[str] = ("crop", "rotate"),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the inverse geometric transforms in projection space.

    proj1/proj2: (B, D) raw projections of the two views (D even).
    params*: per-view dicts with 'jitter_x', 'jitter_y' (pixels; the crop's
    residual translation) and 'angle' (degrees), shapes (B,).

    Pipeline (faithful to hybrid2_model.get_transformed_projections):
    L2-normalize each view's flat projection -> view as (B, D/2, 2) ->
    translate by −jitter/image_size scaled by the point-cloud extent ->
    rotate by −angle about the centroid -> flatten -> renormalize.

    Returns (z1, z2) ready for NT-Xent.
    """
    b, d = proj1.shape
    h, w = image_size

    def one_view(proj, params):
        pts = _l2_normalize(proj).reshape(b, d // 2, 2)
        if "crop" in augmentations:
            # reference quirk reproduced: jitter_x is normalized by
            # image_shape[0] (the HEIGHT) and jitter_y by shape[1]
            # (hybrid2_model.py:59-71); views are square so it is harmless
            tx = -params["jitter_x"] / float(h)
            ty = -params["jitter_y"] / float(w)
            pts = translate_projections(pts, tx, ty)
        if "rotate" in augmentations:
            pts = rotate_projections(pts, -params["angle"])
        return _l2_normalize(pts.reshape(b, d))

    return one_view(proj1, params1), one_view(proj2, params2)
