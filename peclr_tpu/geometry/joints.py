"""Canonical hand-joint orderings and permutations between them.

The canonical ("ait") order groups joints by ring: wrist, then the five MCPs,
five PIPs, five DIPs, five tips (thumb/index/middle/ring/pinky within each
ring).  FreiHAND (== Zimmermann leaderboard order), InterHand and MANO use
per-finger orderings; the tables below are the factual joint-index
correspondences (reference: src/data_loader/joint_mapping.json,
src/data_loader/joints.py:9-55, testing/fh_utils.py:147-205).

Permutations are plain numpy int arrays so they can be baked into jit'd
programs as constants (static gathers compile to cheap XLA `gather`s).
"""

from __future__ import annotations

import numpy as np

NUM_JOINTS = 21

_FINGERS = ("thumb", "index", "middle", "ring", "pinky")
_RINGS = ("mcp", "pip", "dip", "tip")

#: canonical order: wrist, 5x mcp, 5x pip, 5x dip, 5x tip
AIT_JOINT_NAMES = ("wrist",) + tuple(
    f"{finger}_{ring}" for ring in _RINGS for finger in _FINGERS
)

#: joint-name -> index tables for every supported convention
JOINT_ORDERS: dict[str, dict[str, int]] = {
    "ait": {name: i for i, name in enumerate(AIT_JOINT_NAMES)},
    # FreiHAND / Zimmermann: wrist then thumb(mcp,pip,dip,tip), index(...), ...
    "freihand": {
        "wrist": 0,
        **{
            f"{finger}_{ring}": 1 + 4 * fi + ri
            for fi, finger in enumerate(_FINGERS)
            for ri, ring in enumerate(_RINGS)
        },
    },
    # InterHand: tips first within each finger, wrist last
    "interhand": {
        "wrist": 20,
        **{
            f"{finger}_{ring}": 4 * fi + (3 - ri)
            for fi, finger in enumerate(_FINGERS)
            for ri, ring in enumerate(_RINGS)
        },
    },
    # MANO regressor output order (16 regressed + 5 appended fingertips)
    "mano": {
        "wrist": 0,
        "index_mcp": 1, "index_pip": 2, "index_dip": 3,
        "middle_mcp": 4, "middle_pip": 5, "middle_dip": 6,
        "pinky_mcp": 7, "pinky_pip": 8, "pinky_dip": 9,
        "ring_mcp": 10, "ring_pip": 11, "ring_dip": 12,
        "thumb_mcp": 13, "thumb_pip": 14, "thumb_dip": 15,
        "thumb_tip": 16, "index_tip": 17, "middle_tip": 18,
        "ring_tip": 19, "pinky_tip": 20,
    },
}

WRIST = JOINT_ORDERS["ait"]["wrist"]          # 0
INDEX_MCP = JOINT_ORDERS["ait"]["index_mcp"]  # 2
MIDDLE_MCP = JOINT_ORDERS["ait"]["middle_mcp"]  # 3
MIDDLE_PIP = JOINT_ORDERS["ait"]["middle_pip"]  # 8


def permutation(src: str, dst: str) -> np.ndarray:
    """Index array ``p`` such that ``joints_dst = joints_src[..., p, :]``.

    For each joint name, ``p[dst_index] = src_index``.
    """
    src_map, dst_map = JOINT_ORDERS[src], JOINT_ORDERS[dst]
    p = np.zeros(NUM_JOINTS, dtype=np.int32)
    for name, d in dst_map.items():
        p[d] = src_map[name]
    return p


def reorder(joints, src: str, dst: str):
    """Reorder joints (…, 21, C) from convention `src` to `dst`."""
    return joints[..., permutation(src, dst), :]


def freihand_to_ait(joints):
    return reorder(joints, "freihand", "ait")


def ait_to_freihand(joints):
    """AIT -> FreiHAND/Zimmermann order (leaderboard convention)."""
    return reorder(joints, "ait", "freihand")


def mano_to_ait(joints):
    return reorder(joints, "mano", "ait")


def interhand_to_ait(joints):
    return reorder(joints, "interhand", "ait")
