"""Isolate why augmentation costs ~400ms inside the train step but ~1ms
standalone: scan-wrapping vs autodiff interaction vs stop_gradient."""

import dataclasses
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
    print(f"{name:44s} {dt * 1e3:8.2f} ms  ({B / dt:7.0f} img/s)", flush=True)


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

    def build_step(stop_grad_images: bool, aug_outside_grad: bool):
        tx, _ = build_optimizer(
            jax.tree_util.tree_map(jnp.array, variables)["params"],
            1e-4, B, 1, 1000, 100, optimizer="LARS",
        )
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = TrainState.create(fresh, tx)

        def forward_loss(params, batch_stats, both, p1, p2):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                both, train=True, mutable=["batch_stats"],
            )
            proj = out["projection"]
            b = proj.shape[0] // 2
            z1, z2 = peclr_projections(
                proj[:b], proj[b:], p1, p2, image_size=(128, 128),
                augmentations=("crop", "rotate"),
            )
            return ntxent_loss(z1, z2), mut["batch_stats"]

        def micro_loss(params, batch_stats, images, joints, key):
            v1, v2 = augment_pair(key, images, joints, flags, aug)
            both = jnp.concatenate([v1.images, v2.images], axis=0)
            if stop_grad_images:
                both = jax.lax.stop_gradient(both)
            return forward_loss(params, batch_stats, both, v1.params, v2.params)

        if aug_outside_grad:
            def step_fn(state, batch_, key):
                v1, v2 = augment_pair(
                    key, batch_["image"], batch_["joints25d"], flags, aug
                )
                both = jnp.concatenate([v1.images, v2.images], axis=0)
                g = jax.value_and_grad(forward_loss, has_aux=True)
                (loss, bs), grads = g(
                    state.params, state.batch_stats, both, v1.params, v2.params
                )
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params, updates
                )
                return dataclasses.replace(
                    state, step=state.step + 1, params=params,
                    batch_stats=bs, opt_state=opt_state,
                ), {"loss": loss}
        else:
            def step_fn(state, batch_, key):
                g = jax.value_and_grad(micro_loss, has_aux=True)
                (loss, bs), grads = g(
                    state.params, state.batch_stats,
                    batch_["image"], batch_["joints25d"], key,
                )
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params, updates
                )
                return dataclasses.replace(
                    state, step=state.step + 1, params=params,
                    batch_stats=bs, opt_state=opt_state,
                ), {"loss": loss}

        return jax.jit(step_fn, donate_argnums=(0,)), state

    step, state = build_step(False, False)
    chain("no scan, aug in grad", step, state, batch)
    step, state = build_step(True, False)
    chain("no scan, aug in grad + stop_grad", step, state, batch)
    step, state = build_step(False, True)
    chain("no scan, aug OUTSIDE grad", step, state, batch)


if __name__ == "__main__":
    main()
