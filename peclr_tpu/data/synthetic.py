"""Synthetic FreiHAND-layout dataset generator (tests + benchmarking).

Writes a directory tree identical to the real FreiHAND distribution
(training/rgb/*.jpg + training_{xyz,K,scale}.json) populated with procedural
hand-like images whose 21 3-D joints are geometrically consistent with the
rendered dot pattern — enough to exercise the entire stack end-to-end
(decode -> augment -> train -> eval) without the real 10 GB download.
"""

from __future__ import annotations

import json
import os

import numpy as np

from peclr_tpu.geometry.joints import permutation

_K = [[388.9, 0.0, 112.0], [0.0, 388.7, 112.0], [0.0, 0.0, 1.0]]


def _random_hand_3d(rng):
    """Plausible 21-joint hand in canonical (ait) order, metric meters."""
    wrist = np.array([0.0, 0.0, 0.0])
    joints = [wrist]
    for finger in range(5):
        ang = (finger - 2) * 0.35 + rng.normal(0, 0.08)
        direction = np.array([np.sin(ang), -np.cos(ang), rng.normal(0, 0.15)])
        direction /= np.linalg.norm(direction)
        base = 0.09 + rng.normal(0, 0.004)
        for ring, dist in enumerate((base, base * 1.35, base * 1.6, base * 1.8)):
            joints.append(wrist + direction * dist)
    # reorder finger-major -> ring-major (ait): joints currently wrist +
    # [f0 mcp,pip,dip,tip, f1 ...]; build ait directly
    ait = np.zeros((21, 3), np.float32)
    ait[0] = wrist
    for finger in range(5):
        for ring in range(4):
            ait[1 + ring * 5 + finger] = joints[1 + finger * 4 + ring]
    center = np.array(
        [rng.uniform(-0.03, 0.03), rng.uniform(-0.03, 0.03), rng.uniform(0.45, 0.6)]
    )
    return (ait + center).astype(np.float32)


def _render(joints3d, K, rng, size=224):
    """Rasterize dots+bones on a noisy background (uint8 RGB)."""
    img = rng.integers(30, 90, size=(size, size, 3), dtype=np.uint8)
    uv = (K @ joints3d.T).T
    uv = uv[:, :2] / uv[:, 2:3]
    color = rng.integers(120, 255, size=3)
    for x, y in uv:
        xi, yi = int(x), int(y)
        if 2 <= xi < size - 2 and 2 <= yi < size - 2:
            img[yi - 2: yi + 3, xi - 2: xi + 3] = color
    return img


def generate_freihand_like(
    root_dir: str, num_unique: int = 32, seed: int = 0, size: int = 224
) -> str:
    """Create a miniature FreiHAND-layout dataset; returns root_dir.

    num_unique unique frames x 4 'versions' (re-encoded copies), with
    training_xyz.json stored in FreiHAND joint order.
    """
    rng = np.random.default_rng(seed)
    rgb = os.path.join(root_dir, "training", "rgb")
    os.makedirs(rgb, exist_ok=True)
    ait_to_fh = permutation("ait", "freihand")

    xyz, Ks, scales = [], [], []
    try:
        import cv2

        def save(path, img):
            cv2.imwrite(path, img[:, :, ::-1])
    except ImportError:
        from PIL import Image

        def save(path, img):
            Image.fromarray(img).save(path, quality=92)

    images = []
    for i in range(num_unique):
        joints_ait = _random_hand_3d(rng)
        K = np.asarray(_K, np.float32)
        img = _render(joints_ait, K, rng, size)
        images.append(img)
        joints_fh = joints_ait[ait_to_fh]
        xyz.append(joints_fh.tolist())
        Ks.append(K.tolist())
        scales.append(float(np.linalg.norm(joints_ait[2] - joints_ait[0])))

    for version in range(4):
        for i, img in enumerate(images):
            save(os.path.join(rgb, f"{version * num_unique + i:08d}.jpg"), img)

    with open(os.path.join(root_dir, "training_xyz.json"), "w") as f:
        json.dump(xyz, f)
    with open(os.path.join(root_dir, "training_K.json"), "w") as f:
        json.dump(Ks, f)
    with open(os.path.join(root_dir, "training_scale.json"), "w") as f:
        json.dump(scales, f)
    return root_dir


def generate_freihand_eval_like(
    root_dir: str, num_images: int = 8, seed: int = 1, size: int = 224
) -> str:
    """Create a miniature FreiHAND *evaluation* split (images + K + metric
    scale, no joint labels — the leaderboard layout)."""
    rng = np.random.default_rng(seed)
    rgb = os.path.join(root_dir, "evaluation", "rgb")
    os.makedirs(rgb, exist_ok=True)
    try:
        import cv2

        def save(path, img):
            cv2.imwrite(path, img[:, :, ::-1])
    except ImportError:
        from PIL import Image

        def save(path, img):
            Image.fromarray(img).save(path, quality=92)

    Ks, scales = [], []
    for i in range(num_images):
        joints_ait = _random_hand_3d(rng)
        K = np.asarray(_K, np.float32)
        save(os.path.join(rgb, f"{i:08d}.jpg"), _render(joints_ait, K, rng, size))
        Ks.append(K.tolist())
        scales.append(float(np.linalg.norm(joints_ait[2] - joints_ait[0])))
    with open(os.path.join(root_dir, "evaluation_K.json"), "w") as f:
        json.dump(Ks, f)
    with open(os.path.join(root_dir, "evaluation_scale.json"), "w") as f:
        json.dump(scales, f)
    return root_dir
