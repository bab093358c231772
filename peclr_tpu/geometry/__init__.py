"""Geometry core: joint-order permutations, 2.5D<->3D camera math,
affine-transform helpers and procrustes alignment.

Pure jnp, batch-first, no data-dependent control flow — usable inside jit on
both the data pipeline side and the loss/eval side.
"""

from peclr_tpu.geometry.joints import (  # noqa: F401
    AIT_JOINT_NAMES,
    JOINT_ORDERS,
    NUM_JOINTS,
    WRIST,
    INDEX_MCP,
    permutation,
    reorder,
    freihand_to_ait,
    ait_to_freihand,
    mano_to_ait,
    interhand_to_ait,
)
from peclr_tpu.geometry.camera import (  # noqa: F401
    convert_to_2_5d,
    convert_2_5d_to_3d,
    root_depth,
    move_wrist_to_palm,
    move_palm_to_wrist,
)
from peclr_tpu.geometry.affine import (  # noqa: F401
    rotation_matrix_2d,
    rotation_about_center,
    apply_affine,
    compose,
    invert_affine,
    affine_from_bbox,
)
from peclr_tpu.geometry.procrustes import procrustes_align  # noqa: F401
from peclr_tpu.geometry.mano import joints_from_mano_mesh  # noqa: F401
