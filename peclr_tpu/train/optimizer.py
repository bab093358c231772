"""Optimizer assembly: Adam(+LARS) with sqrt-batch lr scaling, linear-warmup
cosine schedule counted in optimizer steps, and no-decay masking for
bias/batch-norm parameters.

Reference semantics (src/models/base_model.py:30-104):
  * lr = base_lr * sqrt(batch_size * accumulate_grad_batches)
  * parameters whose name contains 'bias' or 'bn' get weight_decay = 0
  * optimizer == 'LARS': pl_bolts LARSWrapper around Adam + linear-warmup
    cosine annealing (warmup_epochs from config), scheduler stepped per
    optimizer step with step counts divided by the accumulation factor;
  * otherwise plain Adam + CosineAnnealingLR.

LARS is implemented as an optax gradient transform applied before Adam:
per-leaf trust ratio lamb = eta * ||p|| / (||g|| + wd*||p|| + eps), clipped
against the current schedule lr (pl_bolts `clip=True` behavior), with the
weight decay folded into the gradient (and therefore excluded from Adam's
own decay).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def no_decay_mask(params) -> dict:
    """True for leaves that SHOULD be decayed (kernels outside batch-norm);
    False for biases and all batch-norm parameters."""

    def keep(path: tuple) -> bool:
        names = [str(p) for p in path]
        if names[-1] == "bias":
            return False
        if any("bn" in n for n in names):
            return False
        return True

    import flax

    flat_dict = flax.traverse_util.flatten_dict(params)
    return flax.traverse_util.unflatten_dict({k: keep(k) for k in flat_dict})


def scaled_lr(base_lr: float, batch_size: int, accum: int) -> float:
    return base_lr * math.sqrt(batch_size * accum)


def warmup_cosine(
    peak_lr: float, warmup_steps: int, total_steps: int, end_lr: float = 0.0
) -> optax.Schedule:
    """Linear 0->peak over warmup_steps, cosine peak->end over the rest."""
    warmup_steps = max(warmup_steps, 1)
    total_steps = max(total_steps, warmup_steps + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=end_lr,
    )


def cosine(peak_lr: float, total_steps: int) -> optax.Schedule:
    return optax.cosine_decay_schedule(peak_lr, max(total_steps, 1))


class LarsState(NamedTuple):
    count: jnp.ndarray


def lars_wrapper(
    schedule: optax.Schedule,
    trust_coefficient: float = 0.001,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask: Optional[dict] = None,
    clip: bool = True,
) -> optax.GradientTransformation:
    """pl_bolts-style LARSWrapper as a gradient transform (applied before the
    inner optimizer)."""

    def init(params):
        del params
        return LarsState(count=jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        # Per-leaf trust ratios with the scalar math batched into ONE vector
        # kernel (stacked norms) instead of ~160 scalar-op chains — same math
        # bit-for-bit, far fewer tiny TPU kernels.
        lr = schedule(state.count)
        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        p_leaves = jax.tree_util.tree_leaves(params)
        if mask is not None:
            use_wd = [bool(m) for m in jax.tree_util.tree_leaves(mask)]
        else:
            use_wd = [True] * len(p_leaves)
        wd_vec = jnp.asarray(
            [weight_decay if m else 0.0 for m in use_wd], jnp.float32
        )
        p_norm = jnp.sqrt(
            jnp.stack([jnp.sum(jnp.square(p)) for p in p_leaves])
        )
        g_norm = jnp.sqrt(
            jnp.stack([jnp.sum(jnp.square(g)) for g in g_leaves])
        )
        lamb = trust_coefficient * p_norm / (g_norm + wd_vec * p_norm + eps)
        if clip:
            lamb = jnp.minimum(lamb / jnp.maximum(lr, 1e-12), 1.0)
        lamb = jnp.where((p_norm > 0) & (g_norm > 0), lamb, 1.0)
        out_leaves = [
            (g + wd_vec[i] * p) * lamb[i]
            for i, (g, p) in enumerate(zip(g_leaves, p_leaves))
        ]
        out = jax.tree_util.tree_unflatten(treedef, out_leaves)
        return out, LarsState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params,
    base_lr: float,
    batch_size: int,
    accum: int,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: int = 10,
    weight_decay: float = 1e-6,
    optimizer: str = "LARS",
    lr_max_epochs: Optional[int] = None,
):
    """Returns (optax transform, schedule fn).

    steps_per_epoch counts *data* iterations; optimizer-step counts divide by
    the accumulation factor (base_model.py:67-88).
    """
    peak = scaled_lr(base_lr, batch_size, accum)
    sched_epochs = lr_max_epochs if lr_max_epochs is not None else epochs
    total_opt_steps = sched_epochs * steps_per_epoch // max(accum, 1)
    mask = no_decay_mask(params)

    if optimizer == "LARS":
        warmup_steps = warmup_epochs * steps_per_epoch // max(accum, 1)
        schedule = warmup_cosine(peak, warmup_steps, total_opt_steps)
        tx = optax.chain(
            lars_wrapper(schedule, weight_decay=weight_decay, mask=mask),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda c: -schedule(c)),
        )
    else:
        schedule = cosine(peak, total_opt_steps)
        tx = optax.chain(
            optax.masked(optax.add_decayed_weights(weight_decay), mask),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda c: -schedule(c)),
        )
    return tx, schedule
