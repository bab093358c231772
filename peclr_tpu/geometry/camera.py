"""2.5D <-> 3D camera-space conversions with closed-form scale-normalized
root depth (Iqbal et al., arXiv:1804.09534 eqs. 6-7).

All functions are batch-first over a leading batch axis and pure jnp, so they
run under jit/vmap/grad on TPU.  Semantics match the reference
(src/data_loader/utils.py:19-110,305-353) including its numerical guards:
the quadratic's `a` coefficient and discriminant are clamped at 1e-6.

Conventions
-----------
joints3d : (..., 21, 3) metric camera-space coordinates, canonical (ait) order
joints25d: (..., 21, 3) — [:, :2] are pixel coords (u, v); [:, 2] is the
           scale-normalized depth relative to the root (wrist):
           z_rel = (Z - Z_root) / scale
scale    : (...,) metric length of the wrist->index_mcp bone
K        : (..., 3, 3) camera intrinsics
"""

from __future__ import annotations

import jax.numpy as jnp

from peclr_tpu.geometry.joints import INDEX_MCP, WRIST

_EPS = 1e-6


def convert_to_2_5d(K, joints3d):
    """Project 3D joints to 2.5D (pixels + scale-normalized relative depth).

    Returns (joints25d, scale) with shapes (..., 21, 3) and (...,).
    """
    joints3d = jnp.asarray(joints3d)
    bone = joints3d[..., INDEX_MCP, :] - joints3d[..., WRIST, :]
    scale = jnp.sqrt(jnp.sum(bone * bone, axis=-1))
    z = joints3d[..., :, 2:3]
    uvw = jnp.einsum("...ij,...nj->...ni", K, joints3d) / z
    z_rel = (joints3d[..., :, 2] - joints3d[..., WRIST, 2][..., None]) / scale[..., None]
    joints25d = jnp.concatenate([uvw[..., :2], z_rel[..., None]], axis=-1)
    return joints25d, scale


def root_depth(joints25d, K):
    """Closed-form scale-normalized Z_root from 2.5D joints.

    Solves the quadratic of Iqbal et al. eq. 6-7 using the wrist (n) and
    index-mcp (m) joints with unit bone-length constraint C=1.

    Returns (z_root, K_inv) with shapes (...,) and (..., 3, 3).
    """
    joints25d = jnp.asarray(joints25d)
    K_inv = jnp.linalg.inv(K)

    def backproject(joint_uv):
        hom = jnp.concatenate([joint_uv, jnp.ones_like(joint_uv[..., :1])], axis=-1)
        return jnp.einsum("...ij,...j->...i", K_inv, hom)

    xyz_n = backproject(joints25d[..., WRIST, :2])
    xyz_m = backproject(joints25d[..., INDEX_MCP, :2])
    x_n, y_n = xyz_n[..., 0], xyz_n[..., 1]
    x_m, y_m = xyz_m[..., 0], xyz_m[..., 1]
    z_n = joints25d[..., WRIST, 2]
    z_m = joints25d[..., INDEX_MCP, 2]

    a = (x_n - x_m) ** 2 + (y_n - y_m) ** 2
    b = 2.0 * (
        z_n * (x_n**2 + y_n**2 - x_n * x_m - y_n * y_m)
        + z_m * (x_m**2 + y_m**2 - x_n * x_m - y_n * y_m)
    )
    c = (
        (x_n * z_n - x_m * z_m) ** 2
        + (y_n * z_n - y_m * z_m) ** 2
        + (z_n - z_m) ** 2
        - 1.0
    )
    disc = jnp.clip(b * b - 4.0 * a * c, min=_EPS)
    sqrt_disc = jnp.sqrt(disc)
    # Larger root of a·z² + b·z + c, computed in the cancellation-free form:
    # (−b+√disc)/(2a) loses all f32 precision when b>0 and |4ac| ≪ b²; the
    # algebraically identical 2c/(−b−√disc) is stable there (bf16/f32 TPU
    # arithmetic makes this restructuring load-bearing, not cosmetic).
    a_safe = jnp.clip(a, min=_EPS)
    root_classic = 0.5 * (-b + sqrt_disc) / a_safe
    denom = -b - sqrt_disc
    root_stable = 2.0 * c / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    z_root = jnp.where(b > 0, root_stable, root_classic)
    return z_root, K_inv


def convert_2_5d_to_3d(joints25d, scale, K, z_root=None):
    """Lift 2.5D joints back to metric 3D camera space.

    If `z_root` is given (e.g. from a refinement MLP) it overrides the
    closed-form estimate.  Shapes: joints25d (..., 21, 3), scale (...,),
    K (..., 3, 3) -> (..., 21, 3).
    """
    joints25d = jnp.asarray(joints25d)
    z_root_calc, K_inv = root_depth(joints25d, K)
    if z_root is None:
        z_root = z_root_calc
    scale = jnp.asarray(scale)
    z = (joints25d[..., :, 2] + z_root[..., None]) * scale[..., None]
    hom = jnp.concatenate(
        [joints25d[..., :, :2], jnp.ones_like(joints25d[..., :, 2:3])], axis=-1
    )
    rays = jnp.einsum("...ij,...nj->...ni", K_inv, hom)
    return rays * z[..., None]


def error_in_conversion(true_joints3d, calc_joints3d):
    """Max abs error of a 3D -> 2.5D -> 3D round trip (the reference's
    notebook-grade sanity util, data_loader/utils.py:113-126)."""
    return jnp.max(jnp.abs(jnp.asarray(calc_joints3d) - jnp.asarray(true_joints3d)))


def move_wrist_to_palm(joints3d):
    """Replace the wrist joint with the palm midpoint (wrist+index_mcp)/2.

    Mirrors the `use_palm` option (reference data_set.py:471-475).
    """
    palm = (joints3d[..., WRIST, :] + joints3d[..., INDEX_MCP, :]) / 2.0
    return joints3d.at[..., WRIST, :].set(palm)


def move_palm_to_wrist(joints3d, middle_mcp_index=3):
    """Inverse of palm regression at inference: wrist = 2*palm - middle_mcp
    (reference testing/fh_utils.py:208-214; index 3 is middle_mcp in ait
    order)."""
    wrist = 2.0 * joints3d[..., WRIST, :] - joints3d[..., middle_mcp_index, :]
    return joints3d.at[..., WRIST, :].set(wrist)
