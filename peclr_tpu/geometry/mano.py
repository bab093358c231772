"""MANO-mesh -> 21-joint extraction.

A fixed 16x778 linear regressor maps the 778 MANO mesh vertices to 16 joints;
the 5 fingertips are specific mesh vertices (thumb, index, middle, ring,
pinky).  The resulting 21 joints are in "mano" order (see geometry/joints.py).
Reference: src/data_loader/utils.py:378-396 + the binary asset
mano_mesh_to_joints_mat.pth (re-packaged here as .npy).
"""

from __future__ import annotations

import os

import numpy as np

_ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "mano_mesh_to_joints_mat.npy",
)

#: mesh-vertex indices of the five fingertips (thumb..pinky)
FINGERTIP_VERTICES = np.array([744, 320, 443, 555, 672], dtype=np.int32)

_MANO_MAT = None


def mano_regressor() -> np.ndarray:
    """The (16, 778) joint-regressor matrix (lazily loaded, cached)."""
    global _MANO_MAT
    if _MANO_MAT is None:
        _MANO_MAT = np.load(_ASSET)
    return _MANO_MAT


def joints_from_mano_mesh(vertices: np.ndarray) -> np.ndarray:
    """(..., 778, 3) mesh vertices -> (..., 21, 3) joints in mano order."""
    vertices = np.asarray(vertices, dtype=np.float32)
    joints16 = np.einsum("jv,...vc->...jc", mano_regressor(), vertices)
    tips = vertices[..., FINGERTIP_VERTICES, :]
    return np.concatenate([joints16, tips], axis=-2)
