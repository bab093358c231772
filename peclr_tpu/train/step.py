"""Jitted PeCLR training step: device-side augmentation + encoder +
equivariant NT-Xent + grad-accumulated optimizer update, all in ONE program.

Layout of one step (reference call stack SURVEY §3.3, re-architected):

    batch (accum*B raw uint8 canvases + keypoints)           [device, sharded]
      └─ lax.scan over `accum` microbatches:
           augment_pair  -> two views + equivariance params  [fused warp]
           encoder+head  -> projections (bf16 convs, f32 head)
           peclr_projections -> inverse transforms
           ntxent_loss   -> per-microbatch loss (negatives span the
                            microbatch's global 2B, matching the reference's
                            accumulate_grad_batches semantics)
           grad          -> accumulated mean
      └─ one optimizer update (LARS+Adam+schedule)

The whole step is a single jit; under a mesh the batch axis is sharded over
'data' and XLA inserts the gradient psum and the NT-Xent all_gather.
"""

from __future__ import annotations

import dataclasses

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
from peclr_tpu.losses.equivariance import peclr_projections
from peclr_tpu.losses.ntxent import ntxent_loss
from peclr_tpu.ops.augment import augment_pair
from peclr_tpu.train.state import TrainState

#: XLA options applied to the train step on TPU backends.  The latency-hiding
#: scheduler measured 3357 -> 3367 img/s on the RN50 PeCLR recipe (v5e,
#: BENCHLOG.md round 2) — small but consistently the best config; scoped-vmem
#: raises HURT (-10/-18%) and are not used.  The axon tunnel rejects TPU
#: flags in XLA_FLAGS but honors per-compile options, so they are applied
#: via AOT lower/compile.
DEFAULT_TPU_COMPILER_OPTIONS = {"xla_tpu_enable_latency_hiding_scheduler": True}


def resolve_compiler_options(compiler_options):
    if compiler_options != "auto":
        return compiler_options
    # the default options are TPU-specific: allowlist TPU backends ('axon'
    # is this environment's tunneled TPU plugin); GPU/CPU would reject them
    if jax.default_backend() in ("tpu", "axon"):
        return DEFAULT_TPU_COMPILER_OPTIONS
    return None


def jit_with_options(fn, donate_argnums, compiler_options):
    """jit, optionally AOT-compiled with XLA compiler options (cached per
    arg shapes/dtypes/shardings)."""
    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    if not compiler_options:
        return jitted
    cache = {}

    def wrapper(*args):
        # Cache key covers EVERY leaf: arrays by shape/dtype/sharding,
        # non-array leaves (Python scalars, None flags) by repr — a static
        # value change must miss the cache, not silently reuse an executable
        # lowered for a different value.
        key = tuple(
            (l.shape, str(l.dtype), str(getattr(l, "sharding", None)))
            if hasattr(l, "shape") else repr(l)
            for l in jax.tree_util.tree_leaves(args)
        )
        compiled = cache.get(key)
        if compiled is None:
            compiled = jitted.lower(*args).compile(dict(compiler_options))
            cache[key] = compiled
        return compiled(*args)

    return wrapper


def projection_stats(proj, name: str) -> Dict[str, jnp.ndarray]:
    """Per-axis stats of the (B, 64, 2) projection cloud — logging parity
    with hybrid2_model.get_projection_stats (hybrid2_model.py:92-106)."""
    pts = proj.reshape(proj.shape[0], -1, 2)
    out = {}
    for red, rname in ((jnp.mean, "mean"), (jnp.median, "median"),
                       (jnp.min, "min"), (jnp.max, "max")):
        val = jnp.mean(red(pts, axis=1), axis=0)
        out[f"{name}x_{rname}"] = val[0]
        out[f"{name}y_{rname}"] = val[1]
    return out


def make_peclr_train_step(
    model,
    tx,
    flags: AugmentationFlags,
    aug_params: AugmentationParams,
    accum: int = 1,
    unroll: int = 1,
    temperature: float = 0.5,
    augmentations: Optional[Sequence[str]] = None,
    with_stats: bool = True,
    donate: bool = True,
    compiler_options="auto",
) -> Callable:
    """Build the jitted train step.

    Returns step(state, batch, key) -> (state, metrics) where batch contains
    'image' (accum*B, H, W, 3) uint8 and 'joints25d' (accum*B, 21, 3).

    compiler_options: dict of XLA options, None, or "auto"
    (DEFAULT_TPU_COMPILER_OPTIONS on TPU backends, nothing on CPU).
    """
    if augmentations is None:
        augmentations = flags.active()
    image_size = tuple(aug_params.resize_shape)

    def micro_loss(params, batch_stats, images, joints, key):
        v1, v2 = augment_pair(key, images, joints, flags, aug_params)
        both = jnp.concatenate([v1.images, v2.images], axis=0)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            both,
            train=True,
            mutable=["batch_stats"],
        )
        proj = out["projection"]
        b = proj.shape[0] // 2
        z1, z2 = peclr_projections(
            proj[:b], proj[b:], v1.params, v2.params,
            image_size=image_size, augmentations=augmentations,
        )
        loss = ntxent_loss(z1, z2, temperature)
        stats = {}
        if with_stats:
            stats = {
                **projection_stats(jax.lax.stop_gradient(proj[:b]), "proj1"),
                **projection_stats(jax.lax.stop_gradient(proj[b:]), "proj2"),
            }
        return loss, (mutated["batch_stats"], stats)

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        images = batch["image"]
        joints = batch["joints25d"]
        n = images.shape[0]
        mb = n // accum
        images = images.reshape(accum, mb, *images.shape[1:])
        joints = joints.reshape(accum, mb, *joints.shape[1:])
        keys = jax.random.split(key, accum)

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, xs):
            grads_acc, loss_acc, batch_stats = carry
            mb_images, mb_joints, mb_key = xs
            (loss, (new_stats, stats)), grads = grad_fn(
                state.params, batch_stats, mb_images, mb_joints, mb_key
            )
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g, grads_acc, grads
            )
            return (grads_acc, loss_acc + loss, new_stats), stats

        (grads, loss_sum, batch_stats), stats_seq = jax.lax.scan(
            body,
            (zero_grads, jnp.zeros(()), state.batch_stats),
            (images, joints, keys),
            unroll=unroll,
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        metrics = {
            "loss": loss_sum / accum,
            **{k: v[-1] for k, v in stats_seq.items()},
        }
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    return jit_with_options(
        train_step,
        (0,) if donate else (),
        resolve_compiler_options(compiler_options),
    )


def make_peclr_eval_step(
    model,
    flags: AugmentationFlags,
    aug_params: AugmentationParams,
    temperature: float = 0.5,
    augmentations: Optional[Sequence[str]] = None,
) -> Callable:
    """Validation step: same loss, eval-mode batch norm, no update."""
    if augmentations is None:
        augmentations = flags.active()
    image_size = tuple(aug_params.resize_shape)

    def eval_step(state: TrainState, batch, key):
        v1, v2 = augment_pair(
            key, batch["image"], batch["joints25d"], flags, aug_params
        )
        both = jnp.concatenate([v1.images, v2.images], axis=0)
        out = model.apply(state.variables, both, train=False)
        proj = out["projection"]
        b = proj.shape[0] // 2
        z1, z2 = peclr_projections(
            proj[:b], proj[b:], v1.params, v2.params,
            image_size=image_size, augmentations=augmentations,
        )
        return {"loss": ntxent_loss(z1, z2, temperature)}

    return jax.jit(eval_step)
