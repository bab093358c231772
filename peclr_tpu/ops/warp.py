"""Batched affine image warp (the fused rotate ∘ crop ∘ resize).

The reference runs cv2.warpAffine, a numpy crop slice and cv2.resize per
sample on CPU workers (sample_augmenter.py:166-245).  Here the whole
geometric chain is ONE batched gather-interpolate: each destination pixel
back-projects through the composed affine into the source image and samples
bilinearly, with zero padding outside (cv2.warpAffine's default border).

This keeps shapes static (variable crop boxes become per-sample affine
coefficients, not dynamic slices) and lets XLA tile the gather.  The TPU hot
path avoids this gather entirely — ops/warp_mxu.py decomposes the warp into
two MXU matmul passes (see its docstring for the A/B against this kernel).
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_warp(images, matrices, out_hw, fill_value: float = 0.0):
    """Warp a batch of images with per-sample affine matrices.

    images:   (B, H, W, C) float or uint8 — source.
    matrices: (B, 3, 3) mapping SOURCE pixel coords -> DEST pixel coords
              (x right, y down; same convention as geometry/affine.py).
    out_hw:   (out_h, out_w) static output size.

    Returns (B, out_h, out_w, C) float32, bilinear, zero (fill_value) padded.
    """
    b, src_h, src_w, c = images.shape
    out_h, out_w = out_hw
    images = images.astype(jnp.float32)

    inv = jnp.linalg.inv(matrices.astype(jnp.float32))  # dest -> source

    # destination pixel grid (shared across batch)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (out_h, out_w)

    # back-project: src = inv @ [x, y, 1]
    src_x = (
        inv[:, 0, 0, None, None] * grid_x
        + inv[:, 0, 1, None, None] * grid_y
        + inv[:, 0, 2, None, None]
    )
    src_y = (
        inv[:, 1, 0, None, None] * grid_x
        + inv[:, 1, 1, None, None] * grid_y
        + inv[:, 1, 2, None, None]
    )

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        """Sample images at integer coords with zero padding."""
        valid = (xi >= 0) & (xi < src_w) & (yi >= 0) & (yi < src_h)
        xi_c = jnp.clip(xi, 0, src_w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, src_h - 1).astype(jnp.int32)
        # flatten spatial dims for a single batched gather
        flat = images.reshape(b, src_h * src_w, c)
        idx = yi_c * src_w + xi_c  # (B, out_h, out_w)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, out_h, out_w, c)
        return jnp.where(valid[..., None], vals, fill_value)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy
