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
import os

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
from peclr_tpu.losses.equivariance import peclr_projections
from peclr_tpu.losses.ntxent import ntxent_loss
from peclr_tpu.models.resnet import BN_MOMENTUM
from peclr_tpu.ops.augment import augment_pair
from peclr_tpu.train.state import TrainState

#: XLA options applied to the train step on TPU backends.  The latency-hiding
#: scheduler measured 3357 -> 3367 img/s on the RN50 PeCLR recipe (v5e,
#: BENCHLOG.md round 2) — small but consistently the best config — and
#: letting it budget 100% of shared memory measured 3894 -> 3904 (round 3);
#: scoped-vmem raises HURT (-10/-18%) and are not used.  Forcing the memory
#: prefetcher's interval picker to a 1 MiB window measured +26 img/s on the
#: recipe (3905 -> 3931, round 4; 64 KiB was neutral, copy-fusion and
#: licm-inflation were not wins).  The axon tunnel rejects TPU flags in
#: XLA_FLAGS but honors per-compile options, so they are applied via AOT
#: lower/compile.
DEFAULT_TPU_COMPILER_OPTIONS = {
    "xla_tpu_enable_latency_hiding_scheduler": True,
    "xla_tpu_scheduler_percent_shared_memory_limit": 100,
    "xla_tpu_prefetch_interval_picker_size_override": 1048576,
}


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
    stats_accum: str = "outside",
    bn_momentum: float = BN_MOMENTUM,
    accum_width: Optional[int] = None,
    jit: bool = True,
) -> Callable:
    """Build the jitted train step.

    Returns step(state, batch, key) -> (state, metrics) where batch contains
    'image' (accum*B, H, W, 3) uint8 and 'joints25d' (accum*B, 21, 3).

    compiler_options: dict of XLA options, None, or "auto"
    (DEFAULT_TPU_COMPILER_OPTIONS on TPU backends, nothing on CPU).

    stats_accum: how BN running stats cross the accum loop.
      "outside" (default): exploit that train-mode BN never READS its
        running stats (flax normalizes by batch statistics; the running
        buffers are write-only) — each microbatch applies with a ZERO
        running-stat tree, so its mutated output is exactly
        (1-m)*batch_stat, and the chain r_k = m*r_{k-1} + (1-m)*s_k is
        replayed as one packed recurrence T_k = m*T_{k-1} + p_k with the
        closed form r_A = m^A*r_0 + T_A applied once after the scan.
        Equal to the sequential chain in exact arithmetic; removes the
        per-iteration stats unpack (a ~106-slice VMEM<->HBM staging swarm
        — BENCHLOG round 4) and the old-stats reads from the loop body.
      "carry": thread the packed stats through the scan carry (round-3
        behavior, kept for A/B).

    bn_momentum: the models' shared flax BatchNorm momentum (torch 0.1 ==
    flax 0.9), defaulted from models.resnet.BN_MOMENTUM — the single name
    every BatchNorm in the package uses — and used only by
    stats_accum="outside" to replay the chain.  Override it only for a
    custom model whose BNs use a different momentum.

    accum_width: how many INDEPENDENT microbatch gradient chains each scan
      iteration computes (default env PECLR_ACCUM_WIDTH, 1).  Width W keeps
      the microbatch size (and BN semantics) at mb images but gives the
      latency-hiding scheduler W independent fwd+bwd DAGs per iteration to
      interleave — one chain's DMA stalls (the serial BN-backward dx chain
      runs at 631 of 820 GB/s; the BN f32[C] staging swarm is
      latency-bound, BENCHLOG round 4) hide under another chain's compute.
      Differs from lax.scan unroll (which chains the unrolled bodies
      serially through the carry and measured HURT).  Gradient/loss/stat
      accumulation order is IDENTICAL to width 1 — microbatch k's
      contribution is added k-th either way — so results are bit-equal.
      Requires stats_accum="outside" for W>1 (the "carry" layout would
      serialize the chains through the full stats tree).

    jit=False returns the raw python step (for callers that need their own
    jit wrapper, e.g. custom input layouts/shardings at lowering time).
    """
    if augmentations is None:
        augmentations = flags.active()
    image_size = tuple(aug_params.resize_shape)

    if stats_accum not in ("outside", "carry"):
        raise ValueError(
            f"stats_accum={stats_accum!r} (want 'outside' or 'carry')"
        )
    if accum_width is None:
        accum_width = int(os.environ.get("PECLR_ACCUM_WIDTH", "1"))
    if accum_width < 1 or accum % accum_width:
        raise ValueError(
            f"accum_width={accum_width} must divide accum={accum}"
        )
    if accum_width > 1 and stats_accum != "outside":
        raise ValueError(
            "accum_width > 1 requires stats_accum='outside' (the 'carry' "
            "layout serializes the chains through the full stats tree)"
        )

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

    #: leaves at or below this many elements ride the scan carry as ONE
    #: packed vector.  The v5e trace showed ~1,000 tiny copy-start/copy-done
    #: pairs per step (BN scales/biases/stats + their grads threading the
    #: lax.scan carry) costing 22.6 ms/step in DMA-latency stalls; packing
    #: them into a single buffer replaces the swarm with one fused
    #: concat/slice per microbatch (see BENCHLOG round 3).  Env-overridable
    #: (PECLR_PACK_SMALL_ELEMS; 0 = per-leaf carry) so the threshold can be
    #: re-A/B'd on-chip as the scheduler defaults evolve — the r4 trace
    #: still bills ~19 ms/step (RN50) / ~79 ms (RN152) of f32[C] eviction
    #: stalls around the pack concat and the BN fwd->bwd stat staging.
    SMALL_LEAF_ELEMS = int(
        os.environ.get("PECLR_PACK_SMALL_ELEMS", "8192")
    )

    def _split_small(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        small_idx = [i for i, l in enumerate(leaves)
                     if l.size <= SMALL_LEAF_ELEMS]
        big_idx = [i for i, l in enumerate(leaves)
                   if l.size > SMALL_LEAF_ELEMS]
        return leaves, treedef, small_idx, big_idx

    def _pack(leaves, idx):
        if not idx:
            return jnp.zeros((0,), jnp.float32)
        return jnp.concatenate([leaves[i].ravel() for i in idx])

    def _unpack(flat, leaves_like, idx):
        out = list(leaves_like)
        off = 0
        for i in idx:
            n = leaves_like[i].size
            out[i] = flat[off: off + n].reshape(leaves_like[i].shape)
            off += n
        return out

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        images = batch["image"]
        joints = batch["joints25d"]
        n = images.shape[0]
        mb = n // accum
        outer = accum // accum_width
        # (outer, width, mb, ...): iteration i computes width independent
        # microbatch chains; microbatch k = i*width + w keeps the same data
        # and rng key as the width-1 layout
        images = images.reshape(outer, accum_width, mb, *images.shape[1:])
        joints = joints.reshape(outer, accum_width, mb, *joints.shape[1:])
        keys = jax.random.split(key, accum)
        keys = keys.reshape(outer, accum_width, *keys.shape[1:])

        p_leaves, p_def, p_small, p_big = _split_small(state.params)
        s_leaves, s_def, s_small, s_big = _split_small(state.batch_stats)
        big_zero = [jnp.zeros_like(p_leaves[i]) for i in p_big]
        small_zero = jnp.zeros(
            (sum(p_leaves[i].size for i in p_small),), jnp.float32
        ) if p_small else jnp.zeros((0,), jnp.float32)
        outside = stats_accum == "outside"
        if outside:
            # write-only running stats: apply every microbatch with ZEROS
            # (loop-invariant), accumulate the (1-m)-scaled batch stats the
            # mutation returns, and replay the momentum chain in closed
            # form after the scan
            zero_stats = jax.tree_util.tree_map(
                jnp.zeros_like, state.batch_stats
            )
            stats_carry0 = (
                [jnp.zeros_like(s_leaves[i]) for i in s_big],
                jnp.zeros((sum(s_leaves[i].size for i in s_small),),
                          jnp.float32)
                if s_small else jnp.zeros((0,), jnp.float32),
            )
        else:
            stats_carry0 = (
                [s_leaves[i] for i in s_big], _pack(s_leaves, s_small)
            )

        def body(carry, xs):
            big_acc, small_acc, loss_acc, (stats_big, stats_flat) = carry
            mb_images, mb_joints, mb_keys = xs
            if outside:
                batch_stats = zero_stats
            else:
                # width == 1 here (validated above)
                st_leaves = list(s_leaves)
                for j, i in enumerate(s_big):
                    st_leaves[i] = stats_big[j]
                st_leaves = _unpack(stats_flat, st_leaves, s_small)
                batch_stats = jax.tree_util.tree_unflatten(s_def, st_leaves)
            stats = {}
            # width independent chains; only the accumulators (big grads,
            # packed small grads, loss, packed f32[C] stats) link them, so
            # the scheduler may interleave the heavy DAGs freely.  The
            # accumulation order matches width 1 exactly (bit-equal).
            for w in range(accum_width):
                (loss, (new_stats, stats)), grads = grad_fn(
                    state.params, batch_stats,
                    mb_images[w], mb_joints[w], mb_keys[w],
                )
                g_leaves = jax.tree_util.tree_flatten(grads)[0]
                big_acc = [a + g_leaves[i] for a, i in zip(big_acc, p_big)]
                small_acc = small_acc + _pack(g_leaves, p_small)
                loss_acc = loss_acc + loss
                ns_leaves = jax.tree_util.tree_flatten(new_stats)[0]
                if outside:
                    m = bn_momentum
                    stats_big = [
                        m * t + ns_leaves[i]
                        for t, i in zip(stats_big, s_big)
                    ]
                    stats_flat = m * stats_flat + _pack(ns_leaves, s_small)
                else:
                    stats_big = [ns_leaves[i] for i in s_big]
                    stats_flat = _pack(ns_leaves, s_small)
            carry = (big_acc, small_acc, loss_acc, (stats_big, stats_flat))
            return carry, stats

        (big_acc, small_acc, loss_sum, (stats_big, stats_flat)), stats_seq = (
            jax.lax.scan(
                body,
                (big_zero, small_zero, jnp.zeros(()), stats_carry0),
                (images, joints, keys),
                unroll=unroll,
            )
        )
        g_leaves = list(p_leaves)
        for j, i in enumerate(p_big):
            g_leaves[i] = big_acc[j]
        g_leaves = _unpack(small_acc, g_leaves, p_small)
        grads = jax.tree_util.tree_unflatten(p_def, g_leaves)
        st_leaves = list(s_leaves)
        if outside:
            # r_A = m^A r_0 + sum_i m^(A-1-i) * (1-m) s_i  (the scan's T)
            m_pow = jnp.float32(bn_momentum ** accum)
            for j, i in enumerate(s_big):
                st_leaves[i] = m_pow * s_leaves[i] + stats_big[j]
            stats_flat = m_pow * _pack(s_leaves, s_small) + stats_flat
        else:
            for j, i in enumerate(s_big):
                st_leaves[i] = stats_big[j]
        st_leaves = _unpack(stats_flat, st_leaves, s_small)
        batch_stats = jax.tree_util.tree_unflatten(s_def, st_leaves)
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

    if not jit:
        return train_step
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
