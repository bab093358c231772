"""Pin down the augment cost law: scale batch/output size; try the
patch-gather (vmapped dynamic_slice) warp as a replacement."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import peclr_tpu.ops.warp as warp_mod
from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
from peclr_tpu.ops.augment import augment_batch


def chain_scalar(name, fn, iters=5):
    key = jax.random.PRNGKey(0)
    c = fn(jax.random.fold_in(key, 999), jnp.zeros(()))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = jnp.zeros(())
    for i in range(iters):
        c = fn(jax.random.fold_in(key, i), c)
    jax.block_until_ready(c)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def patch_warp(images, matrices, out_hw, fill_value: float = 0.0):
    """Alternative warp: single gather of 2x2xC patches via vmapped
    dynamic_slice (lowers to an XLA gather with slice_sizes)."""
    b, src_h, src_w, c = images.shape
    out_h, out_w = out_hw
    images = images.astype(jnp.float32)
    inv = jnp.linalg.inv(matrices.astype(jnp.float32))
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy + inv[:, 1, 2, None, None]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    xi = jnp.clip(x0, -2, src_w).astype(jnp.int32)
    yi = jnp.clip(y0, -2, src_h).astype(jnp.int32)
    padded = jnp.pad(images, ((0, 0), (2, 2), (2, 2), (0, 0)),
                     constant_values=fill_value)

    def slice_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y + 2, x + 2, 0), (2, 2, c))

    patches = jax.vmap(
        jax.vmap(jax.vmap(slice_one, in_axes=(None, 0, 0)), in_axes=(None, 0, 0))
    )(padded, yi, xi)
    v00 = patches[..., 0, 0, :]
    v01 = patches[..., 0, 1, :]
    v10 = patches[..., 1, 0, :]
    v11 = patches[..., 1, 1, :]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    # emulate exact zero-border of the reference warp
    valid = (sx >= 0) & (sx <= src_w - 1) & (sy >= 0) & (sy <= src_h - 1)
    near = (sx > -1) & (sx < src_w) & (sy > -1) & (sy < src_h)
    return jnp.where(near[..., None], out, fill_value) * 1.0 + 0.0 * valid[..., None]


def run(tag, B, out):
    rng = np.random.default_rng(0)
    flags = peclr_pretrain_flags()
    aug = AugmentationParams(resize_shape=(out, out))
    images = jax.device_put(rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8))
    joints = jax.device_put(
        np.concatenate(
            [rng.uniform(60, 160, (B, 21, 2)), rng.normal(size=(B, 21, 1))],
            axis=-1,
        ).astype(np.float32)
    )

    @jax.jit
    def f(key, c):
        v = augment_batch(key, images, joints, flags, aug, force_crop=True)
        return jnp.mean(v.images) + c

    chain_scalar(f"{tag} B={B} out={out}", f)


def main():
    run("baseline", 256, 128)
    run("baseline", 64, 128)
    run("baseline", 256, 64)
    orig = warp_mod.affine_warp
    warp_mod.affine_warp = patch_warp
    import peclr_tpu.ops.augment as aug_mod

    aug_mod.affine_warp = patch_warp
    try:
        run("patch-gather", 256, 128)
    finally:
        warp_mod.affine_warp = orig
        aug_mod.affine_warp = orig


if __name__ == "__main__":
    main()
