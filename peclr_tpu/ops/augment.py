"""Fused, batched, device-side augmentation pipeline.

This is the TPU re-architecture of the reference's per-sample CPU/OpenCV
augmenter (src/data_loader/sample_augmenter.py): the whole batch is
transformed in one jitted program, the geometric chain
(rotate ∘ crop ∘ resize) collapses into a single affine warp, and the
per-sample random parameters that the equivariant loss must invert (angle,
crop jitter, color factors …) are *emitted as arrays* alongside the batch —
the equivariance contract of prepare_hybrid2_sample (data_set.py:357-384).

Faithfulness notes (verified by tests/test_augment.py against a cv2 oracle):
  * pipeline order: sobel -> cut_out -> blur -> rotate -> crop -> resize ->
    color_jitter -> noise -> color_drop (transform_sample :47-129);
  * every stochastic op except crop/rotate/resize/color_jitter fires with an
    independent p=0.5 coin (random.getrandbits(1));
  * rotation is about the truncated keypoint centroid; angle = floor of a
    uniform draw in [min_angle, max_angle] (:402-416 + :217-245);
  * the crop box: center = truncated centroid of (rotated) keypoints, side =
    2 * trunc(max radial distance * crop_margin), origin = max(center − side
    + jitter, 0) with integer jitter ~ U[0, jitter_max); the *reported*
    jitter_x/y = center − side − origin (:418-468), which is what the loss
    divides by the image size and negates;
  * the crop is clamped by the image bounds before the resize factors are
    computed (numpy-slice semantics, :166-215);
  * interpolation: bilinear everywhere (the reference mixes cv2 INTER_LINEAR
    warp + INTER_AREA resize; equivalence is within interpolation tolerance
    — keypoints and affine params are exact).

All randomness is jax.random with per-op key splits — deterministic given
the step key, reproducible across hosts, and seedable per sample.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
from peclr_tpu.geometry.affine import rotation_about_center
from peclr_tpu.ops import image as im
from peclr_tpu.ops.warp import affine_warp as affine_warp_gather
from peclr_tpu.ops.warp_mxu import affine_warp_mxu

#: warp backend: "mxu" routes the bilinear warp through matmuls (fast on
#: TPU — see ops/warp_mxu.py), "gather" is the direct 4-tap gather (exact
#: reference semantics; slow on TPU, fine on CPU).  The static sampling
#: windows are sized from the config's angle/crop bounds (see
#: `_warp_window_bounds`) so no in-range map is ever clipped.
WARP_BACKEND = "mxu"


def _warp_window_bounds(src_hw, out_hw, params: AugmentationParams,
                        rotate: bool):
    """Static window sizes for the two-pass MXU warp.

    The horizontal sampling slope of the fused rotate∘crop∘resize map is
    |alpha| = fw/cos(angle) where fw <= src/out (crops are clamped to the
    source), so a 45° rotation of a full-canvas crop needs a window √2 wider
    than the raw downscale factor — sizing it from the downscale alone
    silently zeroes rows (caught by tests/test_interp_divergence.py).
    """
    src_h, src_w = src_hw
    out_h, out_w = out_hw
    down_x = max(float(src_w) / out_w, 1.0)
    down_y = max(float(src_h) / out_h, 1.0)
    if rotate:
        max_abs = max(abs(params.min_angle), abs(params.max_angle))
        if max_abs > 80.0:
            # cos -> 0: the window would explode, and past 90 deg the
            # two-pass decomposition itself is invalid.  Fail loudly
            # instead of silently clipping (the round-1 bug class).
            raise ValueError(
                f"MXU warp supports |rotation| <= 80 deg (got {max_abs}); "
                "use the gather warp backend for larger ranges"
            )
        cos_bound = math.cos(math.radians(max_abs))
    else:
        cos_bound = 1.0
    return down_x / cos_bound + 0.05, down_y + 0.05


def affine_warp(images, matrices, out_hw, fill_value: float = 0.0,
                interp: str = "linear", window_bounds=None):
    if WARP_BACKEND == "mxu":
        kw = {}
        if window_bounds is not None:
            kw = {"max_scale_x": window_bounds[0],
                  "max_scale_y": window_bounds[1]}
        return affine_warp_mxu(
            images, matrices, out_hw, fill_value, interp=interp, **kw
        )
    return affine_warp_gather(images, matrices, out_hw, fill_value)


@dataclasses.dataclass
class AugmentOutput:
    images: jnp.ndarray        # (B, out_h, out_w, 3) float32, [0, 1]
    joints: jnp.ndarray        # (B, 21, 3) transformed 2.5D keypoints
    matrix: jnp.ndarray        # (B, 3, 3) source->dest affine
    params: Dict[str, jnp.ndarray]  # per-sample augmentation parameters


def _trunc(x):
    return jnp.trunc(x)


def _crop_box(joints_xy, jitter_xy, crop_margin):
    """Crop-box geometry (reference get_crop_size).

    joints_xy: (B, 21, 2); jitter_xy: (B, 2) integer-valued; crop_margin (B,).
    Returns (origin (B,2), side (B,), reported_jitter (B,2)).
    """
    center = _trunc(jnp.mean(joints_xy, axis=1))  # (B, 2) int-valued floats
    radial = jnp.sqrt(
        jnp.sum((joints_xy - center[:, None, :]) ** 2, axis=-1)
    )
    side = _trunc(jnp.max(radial, axis=1) * crop_margin)  # (B,)
    origin = jnp.maximum(center - side[:, None] + jitter_xy, 0.0)
    reported = center - side[:, None] - origin
    return origin, side, reported


def augment_batch(
    key: jax.Array,
    images_u8: jnp.ndarray,
    joints25d: jnp.ndarray,
    flags: AugmentationFlags,
    params: AugmentationParams,
    force_crop: bool = False,
    zero_jitter: bool = False,
) -> AugmentOutput:
    """Transform one batch (one contrastive view).

    images_u8: (B, H, W, 3) uint8 source canvas.
    joints25d: (B, 21, 3) keypoints in source pixel coords (z untouched).
    force_crop / zero_jitter: the hybrid2 override semantics — crop always
    runs for contrastive samples; when the crop *flag* is off its jitter is
    pinned to 0 (data_set.py:357-367).

    Static-shape note: outputs are always `params.resize_shape` (TPU
    programs need fixed shapes).  The reference's resize flag controls
    whether a resize *happens*; here it is implicit — to reproduce
    "no resize", set resize_shape to the source size.
    """
    b, src_h, src_w, _ = images_u8.shape
    out_w, out_h = params.resize_shape
    # stay uint8 until a photometric op needs floats — the warp shifts
    # uint8 sources at quarter traffic
    if flags.sobel_filter or flags.cut_out or flags.gaussian_blur:
        x = images_u8.astype(jnp.float32)
    else:
        x = images_u8
    joints = joints25d.astype(jnp.float32)

    keys = jax.random.split(key, 12)
    (k_sobel, k_cut_flag, k_cut, k_blur_flag, k_sigma, k_angle, k_jitter,
     k_margin, k_color, k_noise_flag, k_noise, k_drop) = keys

    # ---- sobel (p=0.5) -----------------------------------------------------
    if flags.sobel_filter:
        flag = jax.random.bernoulli(k_sobel, 0.5, (b,))
        x = jnp.where(
            flag[:, None, None, None], im.sobel_filter(x, params.sobel_kernel), x
        )

    # ---- cut-out (p=0.5), anchored at a random keypoint --------------------
    if flags.cut_out:
        flag = jax.random.bernoulli(k_cut_flag, 0.5, (b,))
        kj, kr, kf = jax.random.split(k_cut, 3)
        joint_idx = jax.random.randint(kj, (b,), 0, 20)
        anchor = jnp.take_along_axis(
            joints[..., :2], joint_idx[:, None, None].repeat(2, -1), axis=1
        )[:, 0, :]
        frac = jax.random.uniform(
            kr, (b,), minval=params.cut_out_fraction[0],
            maxval=params.cut_out_fraction[1],
        )
        fill = jax.random.randint(kf, (b,), 0, 255).astype(jnp.float32)
        cut = im.cutout(x, anchor, frac, fill)
        x = jnp.where(flag[:, None, None, None], cut, x)

    # ---- gaussian blur (p=0.5) --------------------------------------------
    sigma = jax.random.uniform(k_sigma, (b,), minval=0.1, maxval=2.0)
    if flags.gaussian_blur:
        blur_flag = jax.random.bernoulli(k_blur_flag, 0.5, (b,))
        x = jnp.where(
            blur_flag[:, None, None, None], im.gaussian_blur(x, sigma), x
        )
    else:
        blur_flag = jnp.zeros((b,), bool)

    # ---- geometric chain: rotate ∘ crop ∘ resize as ONE warp --------------
    # rotation about the truncated keypoint centroid
    if flags.rotate:
        # reference quirk: min/max are swapped on assignment but the range is
        # symmetric, so a plain floor(U[min,max]) draw is equivalent
        angle = jnp.floor(
            jax.random.uniform(
                k_angle, (b,), minval=params.min_angle, maxval=params.max_angle
            )
        )
    else:
        angle = jnp.zeros((b,))
    center0 = _trunc(jnp.mean(joints[..., :2], axis=1))
    rot = rotation_about_center(angle, center0[:, 0], center0[:, 1])
    joints_rot_xy = jnp.einsum(
        "bij,bnj->bni", rot,
        jnp.concatenate([joints[..., :2], jnp.ones_like(joints[..., :1])], -1),
    )[..., :2]

    # crop box on rotated keypoints
    do_crop = flags.crop or force_crop
    if flags.crop and not zero_jitter:
        jitter = _trunc(
            jax.random.uniform(
                k_jitter, (b, 2), minval=params.crop_box_jitter[0],
                maxval=params.crop_box_jitter[1],
            )
        )
    else:
        jitter = jnp.zeros((b, 2))
    if flags.random_crop:
        margin = jax.random.uniform(
            k_margin, (b,), minval=params.crop_margin_range[0],
            maxval=params.crop_margin_range[1],
        )
    else:
        margin = jnp.full((b,), params.crop_margin)

    if do_crop:
        origin, side, reported = _crop_box(joints_rot_xy, jitter, margin)
        box = 2.0 * side
        crop_w = jnp.minimum(origin[:, 0] + box, float(src_w)) - origin[:, 0]
        crop_h = jnp.minimum(origin[:, 1] + box, float(src_h)) - origin[:, 1]
    else:
        origin = jnp.zeros((b, 2))
        reported = jnp.zeros((b, 2))
        crop_w = jnp.full((b,), float(src_w))
        crop_h = jnp.full((b,), float(src_h))

    # degenerate guard (side==0 when all keypoints coincide)
    crop_w = jnp.maximum(crop_w, 1.0)
    crop_h = jnp.maximum(crop_h, 1.0)
    fw = float(out_w) / crop_w
    fh = float(out_h) / crop_h

    # total source->dest matrix: scale(fw,fh) @ translate(-origin) @ rot
    matrix = rot
    matrix = matrix.at[:, 0, 2].add(-origin[:, 0])
    matrix = matrix.at[:, 1, 2].add(-origin[:, 1])
    matrix = matrix.at[:, 0, :].multiply(fw[:, None])
    matrix = matrix.at[:, 1, :].multiply(fh[:, None])

    x = affine_warp(
        x, matrix, (out_h, out_w),
        interp=getattr(params, "interpolation", "linear"),
        window_bounds=_warp_window_bounds(
            (src_h, src_w), (out_h, out_w), params, flags.rotate
        ),
    )
    joints_xy = jnp.stack(
        [
            (joints_rot_xy[..., 0] - origin[:, None, 0]) * fw[:, None],
            (joints_rot_xy[..., 1] - origin[:, None, 1]) * fh[:, None],
        ],
        axis=-1,
    )
    joints = jnp.concatenate([joints_xy, joints[..., 2:]], axis=-1)

    # ---- color jitter (always fires when flagged) -------------------------
    kh, ks, ka, kb = jax.random.split(k_color, 4)
    h_f = jax.random.uniform(kh, (b,), minval=params.hue_factor_range[0],
                             maxval=params.hue_factor_range[1])
    s_f = jax.random.uniform(ks, (b,), minval=params.sat_factor_range[0],
                             maxval=params.sat_factor_range[1])
    a_f = jax.random.uniform(ka, (b,), minval=params.value_factor_alpha_range[0],
                             maxval=params.value_factor_alpha_range[1])
    b_f = jax.random.uniform(kb, (b,), minval=params.value_factor_beta_range[0],
                             maxval=params.value_factor_beta_range[1])
    if flags.color_jitter:
        x = im.color_jitter(x, h_f, s_f, a_f, b_f)

    # ---- gaussian noise (p=0.5) -------------------------------------------
    if flags.gaussian_noise:
        flag = jax.random.bernoulli(k_noise_flag, 0.5, (b,))
        x = jnp.where(
            flag[:, None, None, None],
            im.gaussian_noise(x, k_noise, params.noise_std),
            x,
        )

    # ---- color drop (p=0.5) -----------------------------------------------
    if flags.color_drop:
        flag = jax.random.bernoulli(k_drop, 0.5, (b,))
        x = jnp.where(flag[:, None, None, None], im.grayscale(x), x)

    out_params = {
        "angle": angle,
        "jitter_x": reported[:, 0],
        "jitter_y": reported[:, 1],
        "h": h_f,
        "s": s_f,
        "a": a_f,
        "b": b_f,
        "sigma": sigma,
        "blur_flag": blur_flag.astype(jnp.float32),
        "crop_margin_scale": margin,
    }
    return AugmentOutput(
        images=x / 255.0, joints=joints, matrix=matrix, params=out_params
    )


def relative_params(
    params1: Dict[str, jnp.ndarray],
    params2: Dict[str, jnp.ndarray],
    flags: AugmentationFlags,
) -> Dict[str, jnp.ndarray]:
    """Relative transform parameters between the two views — the pairwise
    experiment's regression targets (reference get_relative_param,
    data_set.py:436-469): crop jitter delta, color-factor deltas, blur-flag
    XOR, rotation delta mod 360."""
    rel: Dict[str, jnp.ndarray] = {}
    if flags.crop:
        rel["jitter"] = jnp.stack(
            [
                params1["jitter_x"] - params2["jitter_x"],
                params1["jitter_y"] - params2["jitter_y"],
            ],
            axis=-1,
        )
    if flags.color_jitter:
        rel["color_jitter"] = jnp.stack(
            [params1[k] - params2[k] for k in ("h", "s", "a", "b")], axis=-1
        )
    if flags.gaussian_blur:
        rel["blur"] = jnp.abs(params1["blur_flag"] - params2["blur_flag"])[
            :, None
        ]
    if flags.rotate:
        rel["rotation"] = ((params1["angle"] - params2["angle"]) % 360.0)[:, None]
    return rel


def augment_pair(
    key: jax.Array,
    images_u8: jnp.ndarray,
    joints25d: jnp.ndarray,
    flags: AugmentationFlags,
    params: AugmentationParams,
    normalize: bool = True,
) -> Tuple[AugmentOutput, AugmentOutput]:
    """Two independent views of the same batch — the PeCLR/hybrid2 sample
    (data_set.py:357-384).  Cropping always runs (with zero jitter when the
    crop flag is off); ImageNet normalization is applied when `normalize`.
    """
    zero_jitter = not flags.crop
    # one fused call over the doubled batch: per-sample randomness makes the
    # two halves independent views, and the whole geometric/photometric
    # pipeline runs once at 2B (same math, better utilization)
    both = augment_batch(
        key,
        jnp.concatenate([images_u8, images_u8], axis=0),
        jnp.concatenate([joints25d, joints25d], axis=0),
        flags,
        params,
        force_crop=True,
        zero_jitter=zero_jitter,
    )
    if normalize:
        both = dataclasses.replace(
            both, images=im.normalize_imagenet(both.images)
        )
    b = images_u8.shape[0]

    def half(i):
        sl = slice(i * b, (i + 1) * b)
        return AugmentOutput(
            images=both.images[sl],
            joints=both.joints[sl],
            matrix=both.matrix[sl],
            params={k: v[sl] for k, v in both.params.items()},
        )

    return half(0), half(1)
