"""Find the slow fusion: augment -> {mean | barrier+mean | conv | model}."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
from peclr_tpu.models import PeCLRModel
from peclr_tpu.ops.augment import augment_pair, augment_batch

B = 256


def chain_scalar(name, fn, iters=10):
    """fn(key, carry) -> scalar; chained through carry."""
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


def main():
    rng = np.random.default_rng(0)
    flags = peclr_pretrain_flags()
    aug = AugmentationParams()
    images = jax.device_put(
        rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8)
    )
    joints = jax.device_put(
        np.concatenate(
            [rng.uniform(60, 160, (B, 21, 2)), rng.normal(size=(B, 21, 1))],
            axis=-1,
        ).astype(np.float32)
    )
    kernel = jax.device_put(
        rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.01
    )
    fixed_views = jax.device_put(
        rng.normal(size=(2 * B, 128, 128, 3)).astype(np.float32)
    )

    def conv(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
            (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def aug_mean(key, c):
        v1, v2 = augment_pair(key, images, joints, flags, aug)
        return jnp.mean(v1.images) + jnp.mean(v2.images) + c

    @jax.jit
    def aug_barrier_mean(key, c):
        v1, v2 = augment_pair(key, images, joints, flags, aug)
        both = jnp.concatenate([v1.images, v2.images], axis=0)
        both = jax.lax.optimization_barrier(both)
        return jnp.mean(both) + c

    @jax.jit
    def aug_conv_mean(key, c):
        v1, v2 = augment_pair(key, images, joints, flags, aug)
        both = jnp.concatenate([v1.images, v2.images], axis=0)
        return jnp.mean(conv(both).astype(jnp.float32)) + c

    @jax.jit
    def fixed_conv_mean(key, c):
        x = fixed_views + 0.0 * c
        return jnp.mean(conv(x).astype(jnp.float32)) + c

    @jax.jit
    def one_view_mean(key, c):
        v1 = augment_batch(key, images, joints, flags, aug, force_crop=True)
        return jnp.mean(v1.images) + c

    @jax.jit
    def one_view_params_mean(key, c):
        v1 = augment_batch(key, images, joints, flags, aug, force_crop=True)
        return (
            jnp.mean(v1.images)
            + jnp.mean(v1.params["angle"])
            + jnp.mean(v1.params["jitter_x"])
            + jnp.mean(v1.params["jitter_y"])
            + c
        )

    chain_scalar("one view -> mean", one_view_mean)
    chain_scalar("one view -> mean (+params)", one_view_params_mean)
    chain_scalar("pair -> mean", aug_mean)
    chain_scalar("pair -> barrier -> mean", aug_barrier_mean)
    chain_scalar("fixed -> conv -> mean", fixed_conv_mean)
    chain_scalar("pair -> conv -> mean", aug_conv_mean)


if __name__ == "__main__":
    main()
