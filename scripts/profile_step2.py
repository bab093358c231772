"""Trustworthy step attribution: time the REAL state-chained train step and
ablated variants (no augmentation / adam instead of LARS / stats on).

On the tunneled TPU backend, only data-dependent chains measure true device
time; every variant here chains state -> state.
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


def chain(name, step, state, batch, iters=10):
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, jax.random.fold_in(key, 999))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.2f} ms  ({B / dt:7.0f} img/s)", flush=True)
    return state


def main():
    rng = np.random.default_rng(0)
    model = PeCLRModel(resnet_size="50", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    flags = peclr_pretrain_flags()
    aug = AugmentationParams()
    batch = {
        "image": jax.device_put(
            rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8)
        ),
        "joints25d": jax.device_put(
            np.concatenate(
                [rng.uniform(60, 160, (B, 21, 2)), rng.normal(size=(B, 21, 1))],
                axis=-1,
            ).astype(np.float32)
        ),
    }
    views = jax.device_put(
        rng.normal(size=(2 * B, 128, 128, 3)).astype(np.float32)
    )

    def make(opt, with_stats, donate):
        tx, _ = build_optimizer(
            variables["params"], 1e-4, B, 1, 1000, 100, optimizer=opt
        )
        # fresh buffers per variant: donated steps delete their inputs
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = TrainState.create(fresh, tx)
        step = make_peclr_train_step(
            model, tx, flags, aug, accum=1, with_stats=with_stats, donate=donate
        )
        return tx, state, step

    # 1. the production step
    tx, state, step = make("LARS", False, True)
    chain("full step (LARS, donate)", step, state, batch)

    # 2. no-augmentation variant: same loss on fixed pre-augmented views
    def make_noaug(tx):
        def loss_fn(params, batch_stats, v, key):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                v, train=True, mutable=["batch_stats"],
            )
            p = out["projection"]
            z1 = p[:B] / jnp.linalg.norm(p[:B], axis=1, keepdims=True)
            z2 = p[B:] / jnp.linalg.norm(p[B:], axis=1, keepdims=True)
            return ntxent_loss(z1, z2), mut["batch_stats"]

        g = jax.value_and_grad(loss_fn, has_aux=True)

        @jax.jit
        def step(state, batch_, key):
            (loss, bs), grads = g(state.params, state.batch_stats, views, key)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            import dataclasses

            return dataclasses.replace(
                state, step=state.step + 1, params=params,
                batch_stats=bs, opt_state=opt_state,
            ), {"loss": loss}

        return step

    tx2, state2, _ = make("LARS", False, False)
    chain("no-aug step (fixed views)", make_noaug(tx2), state2, batch)

    # 3. adam instead of LARS
    tx3, state3, step3 = make("adam", False, True)
    chain("full step (adam)", step3, state3, batch)

    # 4. with projection stats
    tx4, state4, step4 = make("LARS", True, True)
    chain("full step (+stats)", step4, state4, batch)


if __name__ == "__main__":
    main()
