"""Micro-benchmark of affine-warp formulations on the current backend."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 256, 224, 224, 3
OH, OW = 128, 128


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:8.2f} ms")
    return out


def coords(inv):
    ys = jnp.arange(OH, dtype=jnp.float32)
    xs = jnp.arange(OW, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy + inv[:, 1, 2, None, None]
    return sx, sy


@jax.jit
def warp_take_along(images, inv):
    """Current implementation: 4x take_along_axis on flattened image."""
    sx, sy = coords(inv)
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    wx, wy = (sx - x0)[..., None], (sy - y0)[..., None]

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        idx = yi * W + xi
        vals = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1)
        return jnp.where(valid.reshape(B, OH, OW, 1), vals.reshape(B, OH, OW, C), 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@jax.jit
def warp_patch_gather(images, inv):
    """One gather of 2x2xC patches via nested vmap'd dynamic_slice."""
    sx, sy = coords(inv)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx, wy = (sx - x0)[..., None], (sy - y0)[..., None]
    xi = jnp.clip(x0, -1, W - 1).astype(jnp.int32)
    yi = jnp.clip(y0, -1, H - 1).astype(jnp.int32)
    padded = jnp.pad(images, ((0, 0), (1, 2), (1, 2), (0, 0)))

    def slice_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y + 1, x + 1, 0), (2, 2, C))

    patches = jax.vmap(  # batch
        jax.vmap(jax.vmap(slice_one, in_axes=(None, 0, 0)), in_axes=(None, 0, 0))
    )(padded, yi, xi)  # (B, OH, OW, 2, 2, C)
    valid00 = ((x0 >= 0) & (x0 < W) & (y0 >= 0) & (y0 < H))[..., None]
    # emulate zero-border by masking components
    v00 = patches[..., 0, 0, :]
    v01 = patches[..., 0, 1, :]
    v10 = patches[..., 1, 0, :]
    v11 = patches[..., 1, 1, :]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@jax.jit
def warp_onehot_rows(images, inv):
    """Row one-hot matmul for y, then x gather: exploits that y0 rows repeat.
    intermediate = einsum over source rows with 2-tap row weights (MXU),
    then in-row x gather via take_along_axis on W (smaller gather)."""
    sx, sy = coords(inv)  # (B, OH, OW)
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    wx, wy = sx - x0, sy - y0
    # Build per-(b, out_row) averaged source-row weights is NOT exact when y
    # varies along the row (rotation), so this variant is approximate --
    # measured for speed reference only.
    y_row = sy[:, :, OW // 2]
    y0r = jnp.floor(y_row)
    wyr = (y_row - y0r)[..., None]
    oh_rows = jax.nn.one_hot(y0r.astype(jnp.int32), H, dtype=images.dtype)
    oh_rows2 = jax.nn.one_hot(y0r.astype(jnp.int32) + 1, H, dtype=images.dtype)
    rows = jnp.einsum("boh,bhwc->bowc", oh_rows, images)
    rows2 = jnp.einsum("boh,bhwc->bowc", oh_rows2, images)
    rows = rows * (1 - wyr)[..., None] + rows2 * wyr[..., None]
    xi = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    v0 = jnp.take_along_axis(rows, xi[..., None], axis=2)
    v1 = jnp.take_along_axis(rows, jnp.clip(xi + 1, 0, W - 1)[..., None], axis=2)
    return v0 * (1 - wx[..., None]) + v1 * wx[..., None]


def main():
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.uniform(0, 255, (B, H, W, C)).astype(np.float32))
    theta = rng.uniform(-45, 45, B)
    mats = []
    for t in theta:
        c, s = np.cos(np.deg2rad(t)), np.sin(np.deg2rad(t))
        M = np.array([[c, s, 20.0], [-s, c, 10.0], [0, 0, 1]], np.float32)
        S = np.diag([128 / 180.0, 128 / 180.0, 1.0]).astype(np.float32)
        mats.append(np.linalg.inv(S @ M))
    inv = jax.device_put(np.stack(mats))

    r1 = timeit("take_along_axis x4 (current)", warp_take_along, images, inv)
    r2 = timeit("patch gather (dynamic_slice)", warp_patch_gather, images, inv)
    # closeness check (interiors)
    d = np.abs(np.asarray(r1) - np.asarray(r2))
    print("patch-gather max diff:", d.max())
    timeit("onehot rows (approx)", warp_onehot_rows, images, inv)


if __name__ == "__main__":
    main()
