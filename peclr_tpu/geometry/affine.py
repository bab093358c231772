"""Batched 2D affine-transform helpers (OpenCV pixel-coordinate convention).

These are the building blocks of the fused device-side augmentation pipeline
(ops/augment.py) and of the equivariant loss transforms (losses/equivariance):
every geometric augmentation is expressed as a 3x3 homogeneous matrix so the
whole rotate∘crop∘resize chain composes into a single warp, and its
parameters can be inverted exactly in projection space.

Convention: points are column vectors [x, y, 1]^T; a matrix A maps source
pixel coordinates to destination coordinates, `dst = A @ src`.  This matches
the transformation-matrix bookkeeping of the reference augmenter
(sample_augmenter.py:47-129) and cv2.getRotationMatrix2D
(sample_augmenter.py:402-416).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix_2d(angle_deg, scale=1.0):
    """(..., 2, 2) rotation by `angle_deg` counter-clockwise (math convention
    on y-down image axes this appears clockwise, identical to OpenCV)."""
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad) * scale, jnp.sin(rad) * scale
    row0 = jnp.stack([c, s], axis=-1)
    row1 = jnp.stack([-s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotation_about_center(angle_deg, center_x, center_y, scale=1.0):
    """(..., 3, 3) homogeneous rotation about (center_x, center_y), matching
    cv2.getRotationMatrix2D: [[a, b, (1-a)cx - b*cy], [-b, a, b*cx + (1-a)cy]].
    """
    rad = jnp.deg2rad(angle_deg)
    a = jnp.cos(rad) * scale
    b = jnp.sin(rad) * scale
    tx = (1.0 - a) * center_x - b * center_y
    ty = b * center_x + (1.0 - a) * center_y
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([a, b, tx], axis=-1),
            jnp.stack([-b, a, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def translation(tx, ty):
    """(..., 3, 3) translation matrix."""
    zeros = jnp.zeros_like(jnp.asarray(tx, dtype=jnp.float32))
    ones = jnp.ones_like(zeros)
    return jnp.stack(
        [
            jnp.stack([ones, zeros, jnp.asarray(tx, jnp.float32)], axis=-1),
            jnp.stack([zeros, ones, jnp.asarray(ty, jnp.float32)], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def scaling(sx, sy):
    """(..., 3, 3) anisotropic scaling matrix."""
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    return jnp.stack(
        [
            jnp.stack([sx, zeros, zeros], axis=-1),
            jnp.stack([zeros, sy, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def compose(*mats):
    """Compose affine matrices applied left-to-right in call order:
    compose(A, B, C) applies A first, i.e. returns C @ B @ A."""
    out = mats[0]
    for m in mats[1:]:
        out = jnp.einsum("...ij,...jk->...ik", m, out)
    return out


def invert_affine(mat):
    return jnp.linalg.inv(mat)


def apply_affine(mat, points):
    """Apply (..., 3, 3) affine to (..., N, 2) points -> (..., N, 2)."""
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", mat, hom)
    return out[..., :2]


def affine_from_bbox(bbox, crop_size, target_dist=0.7):
    """Affine mapping the bbox (x1, y1, x2, y2) into a crop_size square, with
    the box occupying `target_dist` of the crop (reference
    testing/fh_utils.py:253-264 / :98-119).

    bbox: (..., 4) -> (..., 3, 3)
    """
    bbox = jnp.asarray(bbox, jnp.float32)
    cx = (bbox[..., 0] + bbox[..., 2]) / 2.0
    cy = (bbox[..., 1] + bbox[..., 3]) / 2.0
    length = jnp.maximum(bbox[..., 2] - bbox[..., 0], bbox[..., 3] - bbox[..., 1])
    s = target_dist * crop_size / length
    # shift bbox center to origin, scale, then shift to crop center
    return compose(
        translation(-cx, -cy),
        scaling(s, s),
        translation(
            jnp.full_like(cx, crop_size / 2.0), jnp.full_like(cy, crop_size / 2.0)
        ),
    )


def modify_bbox(bbox, scale):
    """Rescale a bbox about its center and make it square (side = max side *
    scale), matching testing/fh_utils.py:217-230."""
    bbox = jnp.asarray(bbox, jnp.float32)
    cx = (bbox[..., 0] + bbox[..., 2]) / 2.0
    cy = (bbox[..., 1] + bbox[..., 3]) / 2.0
    w = (bbox[..., 2] - bbox[..., 0]) * scale
    h = (bbox[..., 3] - bbox[..., 1]) * scale
    length = jnp.maximum(w, h)
    half = length / 2.0
    return jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=-1)
