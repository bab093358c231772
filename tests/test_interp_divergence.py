"""Quantified bound on the fused-warp vs cv2 two-pass interpolation gap.

The reference pipeline rotates with cv2.warpAffine(INTER_LINEAR), crops by
numpy slice, then resizes with cv2.resize(INTER_AREA)
(sample_augmenter.py:189-245).  The TPU pipeline fuses all three into one
affine warp with INTER_AREA-parity box taps (ops/warp_mxu.py, the two-pass
MXU decomposition).  Keypoints/params are exact; PIXELS differ by
interpolation order.  This sweep (angle x downscale, seeded natural-ish
images) records the divergence; the committed bounds live in PARITY.md
"Known intentional divergences".

Run `python tests/test_interp_divergence.py` to print the full table.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.ops.warp_mxu import affine_warp_mxu

OUT = 128
SRC = 224


def _source_image(seed: int) -> np.ndarray:
    """Band-limited random image — JPEG-like content, no aliasing traps."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (SRC, SRC, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.5)
    # add structure: gradient + a bright box
    yy, xx = np.mgrid[0:SRC, 0:SRC]
    img[..., 0] = 0.5 * img[..., 0] + 0.5 * (xx * 255.0 / SRC)
    img[60:120, 90:170] = np.clip(img[60:120, 90:170] + 80, 0, 255)
    return np.clip(img, 0, 255).astype(np.uint8)


def _two_pass_cv2(img: np.ndarray, angle: float, origin, side: int):
    rot = cv2.getRotationMatrix2D((SRC / 2.0, SRC / 2.0), angle, 1.0)
    rotated = cv2.warpAffine(img, rot, (SRC, SRC), flags=cv2.INTER_LINEAR)
    ox, oy = origin
    crop = rotated[oy : oy + side, ox : ox + side]
    return cv2.resize(crop, (OUT, OUT), interpolation=cv2.INTER_AREA)


def _fused(img: np.ndarray, angle: float, origin, side: int):
    # same map: scale(OUT/side) @ translate(-origin) @ rotate(angle, center)
    rot = cv2.getRotationMatrix2D((SRC / 2.0, SRC / 2.0), angle, 1.0)
    m = np.eye(3, dtype=np.float32)
    m[:2] = rot
    m[0, 2] -= origin[0]
    m[1, 2] -= origin[1]
    m[:2] *= OUT / side
    # window bounds exactly as ops/augment.py derives them from the config
    down = SRC / OUT
    cos_bound = np.cos(np.radians(45.0))
    out = affine_warp_mxu(
        jnp.asarray(img[None]),
        jnp.asarray(m[None]),
        (OUT, OUT),
        interp="area",
        compute_dtype=jnp.float32,
        max_scale_x=down / cos_bound + 0.05,
        max_scale_y=down + 0.05,
    )
    return np.asarray(out[0])


def _divergence(angle: float, downscale: float, seed: int = 0):
    img = _source_image(seed)
    side = int(round(OUT * downscale))
    ox = (SRC - side) // 2
    origin = (ox, ox)
    ref = _two_pass_cv2(img, angle, origin, side).astype(np.float32)
    ours = _fused(img, angle, origin, side)
    # interior comparison: cv2 fills rotation corners with black border that
    # the fused warp (single map) legitimately sees through — compare where
    # the reference had real content
    mask = (
        cv2.warpAffine(
            np.ones((SRC, SRC), np.float32),
            cv2.getRotationMatrix2D((SRC / 2.0, SRC / 2.0), angle, 1.0),
            (SRC, SRC),
        )[origin[1] : origin[1] + side, origin[0] : origin[0] + side]
    )
    mask = cv2.resize(mask, (OUT, OUT)) > 0.999
    diff = np.abs(ref - ours)[mask]
    return float(diff.mean()), float(np.percentile(diff, 99)), float(diff.max())


SWEEP = [(a, d) for a in (0.0, 10.0, -30.0, 45.0) for d in (1.0, 1.4, 1.75)]


@pytest.mark.parametrize("angle,downscale", SWEEP)
def test_divergence_within_committed_bound(angle, downscale):
    mean, p99, mx = _divergence(angle, downscale)
    # Committed bounds (PARITY.md table): mean <= 3.2 intensity levels,
    # p99 <= 17 (worst case 45 deg; measured 2.87 / 15.4).  The gap is
    # interpolation-order only; it does not move keypoints.
    assert mean <= 3.2, (angle, downscale, mean)
    assert p99 <= 17.0, (angle, downscale, p99)


def test_zero_rotation_unit_scale_is_tight():
    # no rotation, no downscale: both pipelines are plain bilinear-ish crops
    mean, p99, mx = _divergence(0.0, 1.0)
    assert mean <= 0.6 and mx <= 8.0


if __name__ == "__main__":
    print(f"{'angle':>6} {'down':>5} {'mean':>7} {'p99':>7} {'max':>7}")
    for a, d in SWEEP:
        m, p, x = _divergence(a, d)
        print(f"{a:6.0f} {d:5.2f} {m:7.3f} {p:7.3f} {x:7.2f}")
