"""Vectorized photometric image ops for the device-side augmentation pipeline.

All ops are batched (B, H, W, 3) float32 in [0, 255] and mirror the
reference's OpenCV semantics (sample_augmenter.py:131-317), including its
channel-order quirks:

  * Images are stored RGB, but the reference calls BGR-flavored cv2
    conversions on them (BGR2GRAY / BGR2HSV on RGB data —
    sample_augmenter.py:144,261,286).  Grayscale therefore weights the
    channels [0.114, 0.587, 0.299] in storage order, and the HSV jitter
    operates on the channel-reversed image.  We reproduce that exactly so
    pretraining statistics match.
  * cv2's uint8 HSV convention: H in [0, 180), S, V in [0, 255].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: cv2 grayscale weights applied in *storage* order (the BGR2GRAY-on-RGB quirk)
_GRAY_W = jnp.array([0.114, 0.587, 0.299], dtype=jnp.float32)

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)


def grayscale(images):
    """(B, H, W, 3) -> (B, H, W, 3) gray replicated across channels."""
    gray = jnp.einsum("bhwc,c->bhw", images, _GRAY_W)
    return jnp.repeat(gray[..., None], 3, axis=-1)


def rgb_to_hsv_cv2(images):
    """RGB (cv2-quirk: treated as BGR) float [0,255] -> (h, s, v) with
    h in [0,180), s,v in [0,255]."""
    # channel-reversal quirk: cv2 assumes ch0=B, so "R" below is storage ch2
    b = images[..., 0]
    g = images[..., 1]
    r = images[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-6) * 255.0, 0.0)
    safe_delta = jnp.maximum(delta, 1e-6)
    h = jnp.where(
        maxc == r,
        60.0 * (g - b) / safe_delta,
        jnp.where(
            maxc == g,
            120.0 + 60.0 * (b - r) / safe_delta,
            240.0 + 60.0 * (r - g) / safe_delta,
        ),
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 uint8 convention: H/2
    return h, s, v


def hsv_to_rgb_cv2(h, s, v):
    """Inverse of rgb_to_hsv_cv2 (including the channel-reversal quirk)."""
    h = (h * 2.0) % 360.0  # back to degrees
    s = s / 255.0
    c = v * s
    x = c * (1.0 - jnp.abs((h / 60.0) % 2.0 - 1.0))
    m = v - c
    zeros = jnp.zeros_like(c)
    sector = (h / 60.0).astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [c, x, zeros, zeros, x],
        c,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [x, c, c, x, zeros],
        zeros,
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [zeros, zeros, x, c, c],
        x,
    )
    # storage order ch0=B, ch1=G, ch2=R (quirk-consistent round trip)
    return jnp.stack([b + m, g + m, r + m], axis=-1)


def color_jitter(images, h_factor, s_factor, alpha, beta):
    """Multiplicative hue/saturation jitter + affine value jitter in HSV
    space.  Factors are per-sample (B,)."""
    h, s, v = rgb_to_hsv_cv2(images)
    bshape = (-1, 1, 1)
    h = jnp.clip(h * h_factor.reshape(bshape), 0.0, 255.0)
    s = jnp.clip(s * s_factor.reshape(bshape), 0.0, 255.0)
    v = jnp.clip(v * alpha.reshape(bshape) + beta.reshape(bshape), 0.0, 255.0)
    # uint8 round-trip in the reference (merge().astype(uint8))
    h, s, v = jnp.floor(h), jnp.floor(s), jnp.floor(v)
    return jnp.clip(hsv_to_rgb_cv2(h, s, v), 0.0, 255.0)


def sobel_filter(images, ksize: int = 3):
    """Gray -> sobel_x + sobel_y (3x3), replicated to 3 channels.  Values are
    clamped to [0,255] (the reference's float->uint8 cast is UB; we saturate).
    """
    gray = jnp.einsum("bhwc,c->bhw", images, _GRAY_W)[..., None]  # (B,H,W,1)
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    kernel = (kx + ky)[..., None, None]  # combined, since sobel is linear
    out = jax.lax.conv_general_dilated(
        gray,
        kernel,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.clip(jnp.repeat(out, 3, axis=-1), 0.0, 255.0)


def gaussian_kernel_1d(sigma, width: int):
    """(B, width) normalized gaussian taps for per-sample sigma."""
    half = (width - 1) / 2.0
    x = jnp.arange(width, dtype=jnp.float32) - half
    k = jnp.exp(-(x[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    return k / jnp.sum(k, axis=1, keepdims=True)


def gaussian_blur(images, sigma, kernel_frac: float = 0.1):
    """Separable gaussian blur; kernel width = 10% of the image dim rounded
    up to odd (reference sample_augmenter.py:295-317), per-sample sigma.

    Implemented as two depthwise 1-D convolutions with per-sample taps via
    einsum over unfolded windows — batched, static shapes.
    """
    b, h, w, c = images.shape
    kw = int(h * kernel_frac)
    kw = kw + 1 if kw % 2 == 0 else kw
    taps = gaussian_kernel_1d(sigma, kw)  # (B, kw)
    pad = kw // 2

    # horizontal pass: pad reflect? cv2 default BORDER_REFLECT_101
    x = jnp.pad(images, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    # unfold windows along width: (B, H, W, kw, C)
    idx = jnp.arange(w)[:, None] + jnp.arange(kw)[None, :]
    x = x[:, :, idx, :]  # (B, H, W, kw, C)
    x = jnp.einsum("bhwkc,bk->bhwc", x, taps)

    y = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    idy = jnp.arange(h)[:, None] + jnp.arange(kw)[None, :]
    y = y[:, idy, :, :]  # (B, H, kw, W, C)
    y = jnp.einsum("bhkwc,bk->bhwc", y, taps)
    return y


def gaussian_noise(images, key, std: float = 25.0):
    """Additive gaussian noise, saturating at [0,255].  (The reference's
    uint8 arithmetic wraps modulo 256 — an artifact of numpy +=; we saturate,
    which is the intended photometric perturbation.)"""
    noise = jax.random.normal(key, images.shape, jnp.float32) * std
    return jnp.clip(images + noise, 0.0, 255.0)


def cutout(images, center_xy, fraction, fill):
    """Zero out (fill) a box of side `fraction`*dim anchored so the given
    per-sample hand keypoint is its center (reference
    sample_augmenter.py:319-380: the 'random' corner range is degenerate, so
    the box is exactly centered on the chosen joint).

    center_xy: (B, 2) pixel coords (x, y); fraction: (B,); fill: (B,) value.
    """
    b, h, w, c = images.shape
    cut_h = jnp.floor(h * fraction)
    cut_w = jnp.floor(w * fraction)
    # reference indexes dim0 (rows) with joints[:,0]=x and dim1 with y —
    # another storage quirk we reproduce: box rows center on x, cols on y
    top = jnp.floor(center_xy[:, 0] - cut_h / 2.0)
    left = jnp.floor(center_xy[:, 1] - cut_w / 2.0)
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # (1,H,1)
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1,1,W)
    in_rows = (rows >= top[:, None, None]) & (rows < top[:, None, None] + cut_h[:, None, None])
    in_cols = (cols >= left[:, None, None]) & (cols < left[:, None, None] + cut_w[:, None, None])
    mask = (in_rows & in_cols)[..., None]  # (B,H,W,1)
    return jnp.where(mask, fill[:, None, None, None], images)


def normalize_imagenet(images_01):
    """[0,1] float images -> ImageNet-normalized (ToTensor+Normalize
    equivalent, reference data_loader/utils.py:286-295)."""
    return (images_01 - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_imagenet(images):
    return images * IMAGENET_STD + IMAGENET_MEAN
