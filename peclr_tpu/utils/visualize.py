"""Debug / experiment-tracking figures: hand skeletons, truth-vs-prediction
overlays, contrastive view pairs.

Equivalent of the reference visualization module
(src/visualization/visualize.py): 21-joint stick figures with per-bone
colors (drawn in FreiHAND bone topology: each finger chains
mcp->pip->dip->tip from the wrist), prediction overlays, and the
augmented-pair panels the tracker logs each epoch.  Figures are written as
PNGs under the experiment directory (the reference uploads to Comet).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from peclr_tpu.geometry.joints import permutation
from peclr_tpu.ops.image import denormalize_imagenet

#: per-bone colormap: 4 shades per finger (thumb..pinky), wrist gray
_FINGER_BASE = np.array(
    [
        [0.8, 0.1, 0.1],  # thumb: red
        [0.1, 0.7, 0.1],  # index: green
        [0.1, 0.3, 0.9],  # middle: blue
        [0.8, 0.7, 0.1],  # ring: yellow
        [0.7, 0.1, 0.8],  # pinky: magenta
    ]
)


def bone_colors() -> np.ndarray:
    shades = np.linspace(0.5, 1.0, 4)
    return np.concatenate(
        [_FINGER_BASE[f] * s for f in range(5) for s in shades]
    ).reshape(20, 3)


def plot_hand(axis, coords_ait: np.ndarray, plot_3d: bool = False,
              linewidth: float = 1.0, linestyle: str = "-", alpha: float = 1.0,
              ms: float = 2.0):
    """Draw a 21-joint hand skeleton on a matplotlib axis (2D or 3D).

    coords_ait: (21, 2|3) in canonical ait order.
    """
    coords = np.asarray(coords_ait)[permutation("ait", "freihand")]
    colors = bone_colors()
    # freihand order: wrist + 5 fingers x (mcp,pip,dip,tip)
    for i in range(20):
        parent = 0 if i % 4 == 0 else i
        child = i + 1
        seg = np.stack([coords[parent], coords[child]])
        if plot_3d:
            axis.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=colors[i],
                      linewidth=linewidth, linestyle=linestyle, alpha=alpha)
        else:
            axis.plot(seg[:, 0], seg[:, 1], color=colors[i],
                      linewidth=linewidth, linestyle=linestyle, alpha=alpha)
    if plot_3d:
        axis.scatter(coords[:, 0], coords[:, 1], coords[:, 2], s=ms)
    else:
        axis.scatter(coords[:, 0], coords[:, 1], s=ms)


def unnormalize_images(images: np.ndarray) -> np.ndarray:
    """ImageNet-normalized (B, H, W, 3) -> displayable [0, 1]."""
    return np.clip(np.asarray(denormalize_imagenet(images)), 0.0, 1.0)


def _savefig(fig, out_dir: Optional[str], name: str) -> Optional[str]:
    if out_dir is None:
        return None
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def plot_truth_vs_prediction(
    pred_ait: np.ndarray, true_ait: np.ndarray, image: np.ndarray,
    out_dir: Optional[str] = None, name: str = "truth_vs_pred.png",
):
    """Side-by-side ground truth / prediction skeleton overlays."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, coords, title in (
        (axes[0], true_ait, "ground truth"),
        (axes[1], pred_ait, "prediction"),
    ):
        ax.imshow(unnormalize_images(image[None])[0] if image.max() <= 8.0
                  else image)
        plot_hand(ax, coords)
        ax.set_title(title)
        ax.axis("off")
    return _savefig(fig, out_dir, name)


def plot_simclr_pair(
    img1: np.ndarray, img2: np.ndarray,
    out_dir: Optional[str] = None, name: str = "simclr_pair.png",
):
    """The two augmented views of one sample."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, img in ((axes[0], img1), (axes[1], img2)):
        ax.imshow(unnormalize_images(img[None])[0] if img.max() <= 8.0 else img)
        ax.axis("off")
    return _savefig(fig, out_dir, name)


def plot_pairwise_pair(
    img1: np.ndarray, img2: np.ndarray,
    joints1: np.ndarray, joints2: np.ndarray,
    out_dir: Optional[str] = None, name: str = "pairwise_pair.png",
):
    """Augmented pair with each view's transformed keypoints overlaid — the
    pairwise-experiment logging panel."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, img, joints in ((axes[0], img1, joints1), (axes[1], img2, joints2)):
        ax.imshow(unnormalize_images(img[None])[0] if img.max() <= 8.0 else img)
        plot_hand(ax, joints)
        ax.axis("off")
    return _savefig(fig, out_dir, name)


def plot_peclr_pair(
    img1: np.ndarray, img2: np.ndarray, params: Dict[str, np.ndarray],
    sample_idx: int = 0, out_dir: Optional[str] = None,
    name: str = "peclr_pair.png",
):
    """Augmented pair annotated with the per-view equivariance parameters
    (angle / jitter), the hybrid2 logging panel."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    for view, (ax, img) in enumerate(((axes[0], img1), (axes[1], img2)), 1):
        ax.imshow(unnormalize_images(img[None])[0] if img.max() <= 8.0 else img)
        angle = params.get(f"angle_{view}")
        jx = params.get(f"jitter_x_{view}")
        jy = params.get(f"jitter_y_{view}")
        bits = [f"view {view}"]
        if angle is not None:
            bits.append(f"angle={float(np.asarray(angle).ravel()[sample_idx]):.0f}")
        if jx is not None:
            bits.append(
                f"jitter=({float(np.asarray(jx).ravel()[sample_idx]):.0f},"
                f"{float(np.asarray(jy).ravel()[sample_idx]):.0f})"
            )
        ax.set_title(" ".join(bits))
        ax.axis("off")
    return _savefig(fig, out_dir, name)
