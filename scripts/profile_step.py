"""Component-level timing of the PeCLR train step on the current backend.

Times: full step / augmentation only / encoder fwd / fwd+bwd / optimizer
update, to locate the throughput bottleneck.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
from peclr_tpu.losses.equivariance import peclr_projections
from peclr_tpu.losses.ntxent import ntxent_loss
from peclr_tpu.models import PeCLRModel
from peclr_tpu.ops.augment import augment_pair
from peclr_tpu.train.optimizer import build_optimizer
from peclr_tpu.train.state import TrainState
from peclr_tpu.train.step import make_peclr_train_step

B = 256


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.2f} ms   ({B / dt:8.0f} img/s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    model = PeCLRModel(resnet_size="50", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    tx, _ = build_optimizer(
        variables["params"], 1e-4, B, 1, 1000, 100, optimizer="LARS"
    )
    state = TrainState.create(variables, tx)
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
    views = jax.device_put(
        rng.normal(size=(2 * B, 128, 128, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)

    # 1. full step
    step = make_peclr_train_step(
        model, tx, flags, aug, accum=1, with_stats=False, donate=False
    )
    timeit("full train step", lambda: step(state, {"image": images, "joints25d": joints}, key)[1]["loss"])

    # 2. augmentation only
    aug_fn = jax.jit(
        lambda k, im, j: augment_pair(k, im, j, flags, aug)[0].images
    )
    timeit("augment_pair", aug_fn, key, images, joints)

    # 3. forward only (fixed views)
    fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=False)["projection"]
    )
    timeit("encoder fwd (2B views)", fwd, variables, views)

    # 4. fwd+bwd (fixed views)
    def loss_fn(params, x):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )[0]
        p = out["projection"]
        z1 = p[:B] / jnp.linalg.norm(p[:B], axis=1, keepdims=True)
        z2 = p[B:] / jnp.linalg.norm(p[B:], axis=1, keepdims=True)
        return ntxent_loss(z1, z2)

    bwd = jax.jit(jax.grad(loss_fn))
    timeit("fwd+bwd (2B views)", lambda: bwd(variables["params"], views))

    # 5. optimizer update only
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    opt = jax.jit(lambda g, s, p: tx.update(g, s, p)[0])
    timeit("optimizer update", opt, grads, state.opt_state, state.params)


if __name__ == "__main__":
    main()
