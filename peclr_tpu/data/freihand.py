"""FreiHAND data source (host side, index + labels only).

Layout (reference src/data_loader/freihand_loader.py): the dataset directory
holds training_{xyz,K,scale}.json with 32,560 entries, and training/rgb/
contains 4 x 32,560 JPEGs — the 4 colorization versions of each frame, so a
sample index maps to labels via `index % 32560`.  The train/val split is a
seeded shuffle of the *unique* frame indices replicated across all 4
versions; the evaluation split carries no joint labels and uses a pseudo
bound-box label (scale 0.33 of the 224px frame) so the standard crop
machinery still works.

This module produces numpy index arrays + label tensors; image bytes are
decoded by the input pipeline (data/pipeline.py / native loader).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


import numpy as np


from peclr_tpu.geometry.camera import convert_2_5d_to_3d
from peclr_tpu.geometry.joints import permutation


def _read_json(path):
    with open(path) as f:
        return json.load(f)


def seeded_split(n: int, train_ratio: float, seed: int):
    """Seeded shuffle split of range(n) -> (train_idx, val_idx), sorted.

    Matches sklearn.model_selection.train_test_split(random_state=seed)
    semantics (the reference's split — freihand_loader.py:56-60) so a model
    trained here sees the same frames as one trained on the reference.
    """
    try:
        from sklearn.model_selection import train_test_split

        tr, va = train_test_split(
            np.arange(n), train_size=train_ratio, random_state=seed
        )
        return np.sort(tr), np.sort(va)
    except ImportError:  # sklearn-free fallback (same contract, not bitwise)
        rng = np.random.RandomState(seed)
        perm = rng.permutation(n)
        n_train = int(np.floor(train_ratio * n))
        return np.sort(perm[:n_train]), np.sort(perm[n_train:])


def pseudo_bound_box(scale: float = 0.33, crop_size: float = 224.0) -> np.ndarray:
    """21 pseudo-2D 'joints' spanning a centered box — the evaluation-split
    stand-in label used only to drive cropping (freihand_loader.py:139-151).
    Returns (21, 3) with homogeneous depth 1."""
    c = crop_size / 2.0
    s = c * scale
    corners = (
        [[0.0, 0.0, 0.0]]
        + [[s, s, 1.0]] * 5
        + [[-s, s, 1.0]] * 5
        + [[s, -s, 1.0]] * 5
        + [[-s, -s, 1.0]] * 5
    )
    box = np.asarray(corners, np.float32)
    box[:, 0] += c
    box[:, 1] += c
    return box


@dataclass
class FreihandSource:
    """Indexable FreiHAND metadata: image paths + per-sample labels."""

    root_dir: str
    split: str = "train"
    seed: int = 5
    train_ratio: float = 0.9

    def __post_init__(self):
        train_like = self.split in ("train", "val")
        sub = "training" if train_like else "evaluation"
        self.img_dir = os.path.join(self.root_dir, sub, "rgb")
        names = sorted(os.listdir(self.img_dir))
        self.img_names = names

        self.K = np.asarray(
            _read_json(os.path.join(self.root_dir, f"{sub}_K.json")), np.float32
        )
        self.metric_scale = np.asarray(
            _read_json(os.path.join(self.root_dir, f"{sub}_scale.json")), np.float32
        )
        if train_like:
            xyz = np.asarray(
                _read_json(os.path.join(self.root_dir, "training_xyz.json")),
                np.float32,
            )
            # remap to canonical (ait) joint order once, vectorized
            self.joints3d = xyz[:, permutation("freihand", "ait"), :]
            n_unique = len(self.K)
            tr, va = seeded_split(n_unique, self.train_ratio, self.seed)
            base = tr if self.split == "train" else va
            self.indices = np.concatenate(
                [base + v * n_unique for v in range(4)], axis=0
            )
        else:
            self.joints3d = None
            self.indices = np.arange(len(self.K))

    def __len__(self):
        return len(self.indices)

    @property
    def n_unique(self) -> int:
        return len(self.K)

    @property
    def image_size(self):
        """(H, W) of the frames (FreiHAND is uniformly sized; probed once).
        Enables the pipeline's whole-batch native-decode fast path."""
        if not hasattr(self, "_image_size"):
            from peclr_tpu.data.pipeline import decode_image

            img = decode_image(self.image_path(0))
            self._image_size = (img.shape[0], img.shape[1])
        return self._image_size

    def image_path(self, i: int) -> str:
        return os.path.join(self.img_dir, self.img_names[self.indices[i]])

    def record(self, i: int) -> dict:
        """Label record for sample i (no image bytes)."""
        idx = self.indices[i]
        if self.joints3d is not None:
            uid = idx % self.n_unique
            return {
                "K": self.K[uid],
                "joints3d": self.joints3d[uid],
                "joints_valid": np.ones((21, 1), np.float32),
                "metric_scale": self.metric_scale[uid],
            }
        K = self.K[idx]
        joints25d = pseudo_bound_box()
        joints3d = np.asarray(
            convert_2_5d_to_3d(joints25d, np.float32(1.0), K), np.float32
        )
        return {
            "K": K,
            "joints3d": joints3d,
            "joints_valid": np.ones((21, 1), np.float32),
            "metric_scale": self.metric_scale[idx],
        }
