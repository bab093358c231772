"""Supervised fine-tune training for the 2.5D pose model (RN25DPose).

The reference ships the fine-tuned RN_25D_wMLPref weights but keeps its
supervised trainer out-of-repo (the baseline models are commented out —
SURVEY §2.1 'vestigial').  This trainer reconstructs the published recipe
from the pieces that ARE in-repo: the supervised sample prep
(data_set.py:278-329), the separated 2D/z L1 losses (models/utils.py:20-50)
and the lifted-3D MAE (models/utils.py:76-104), sharing the PeCLR optimizer
and checkpoint stack.  Pretrained PeCLR encoders load through models/port.py
(encoder -> backbone subtree).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
from peclr_tpu.eval.evaluate import supervised_sample_batch
from peclr_tpu.losses.supervised import l1_loss_25d, loss_3d
from peclr_tpu.train.state import TrainState
from peclr_tpu.train.step import jit_with_options, resolve_compiler_options


def make_finetune_step(
    model,
    tx,
    flags: AugmentationFlags,
    aug_params: AugmentationParams,
    use_palm: bool = False,
    loss_3d_weight: float = 0.0,
    donate: bool = True,
    compiler_options="auto",
) -> Callable:
    """step(state, batch, key) -> (state, metrics).

    Total loss = loss_2d + loss_z (+ loss_3d_weight * lifted-3D MAE).
    """

    def loss_fn(params, batch_stats, batch, key):
        sample = supervised_sample_batch(
            key, batch, flags, aug_params, use_palm=use_palm
        )
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            sample["image"],
            K=sample["K"],
            train=True,
            mutable=["batch_stats"],
        )
        l2d, lz, lz_unscaled = l1_loss_25d(
            out["kp25d"], sample["joints"], sample["scale"],
            sample["joints_valid"],
        )
        total = l2d + lz
        metrics = {
            "loss_2d": l2d,
            "loss_z": lz,
            "loss_z_unscaled": lz_unscaled,
        }
        if loss_3d_weight > 0:
            l3d = loss_3d(
                out["kp25d"], sample["joints3D"], sample["scale"],
                sample["K"], sample["joints_valid"],
            )
            metrics["loss_3d"] = l3d
            total = total + loss_3d_weight * l3d
        metrics["loss"] = total
        return total, (mutated["batch_stats"], metrics)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        (_, (batch_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    return jit_with_options(
        step, (0,) if donate else (), resolve_compiler_options(compiler_options)
    )


def load_pretrained_encoder(variables, peclr_state_dict, resnet_size: str):
    """Initialize the RN25D backbone from a PeCLR checkpoint (reference
    flow: get_encoder_state_dict + peclr_to_torchvision + load into
    backend_model — models/utils.py:209-225, port_model.py:7-48).

    peclr_state_dict: reference-layout dict ('encoder.features.*').
    Returns variables with the backbone subtree replaced.
    """
    import flax

    from peclr_tpu.models import port

    peclr_vars = port.peclr_checkpoint_to_variables(
        peclr_state_dict, resnet_size
    )
    flat = flax.traverse_util.flatten_dict(variables)
    enc = flax.traverse_util.flatten_dict(peclr_vars)
    for k, v in enc.items():
        # ('params', 'encoder', ...) -> ('params', 'backbone', ...)
        if k[1] == "encoder":
            target = (k[0], "backbone") + k[2:]
            if target in flat:
                flat[target] = v
    return flax.traverse_util.unflatten_dict(flat)
