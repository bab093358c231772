"""Shared benchmark/profiling recipe builders.

bench.py, scripts/profile_step.py and scripts/bench_multichip.py all need
the same thing — an initialized PeCLR model + optimizer state and a
synthetic HBM-resident batch — and previously each carried its own copy
(drift hazard: the bench and the profiler must measure the same recipe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.models import PeCLRModel
from peclr_tpu.train.optimizer import build_optimizer
from peclr_tpu.train.state import TrainState


def build_pretrain_state(
    resnet: str = "50",
    batch: int = 128,
    accum: int = 16,
    view: int = 128,
    optimizer: str = "LARS",
    dtype=jnp.bfloat16,
    seed: int = 0,
):
    """Returns (model, state, tx) for the PeCLR pretrain recipe."""
    model = PeCLRModel(resnet_size=resnet, dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, view, view, 3)), train=False
    )
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-4, batch_size=batch, accum=accum,
        steps_per_epoch=1000, epochs=100, warmup_epochs=10,
        optimizer=optimizer,
    )
    return model, TrainState.create(variables, tx), tx


def synthetic_supervised_batch(n: int, canvas: int = 224, seed: int = 0):
    """Synthetic FreiHAND-like supervised batch, device-resident: uint8
    canvases, plausible pinhole K, 3D joints ~0.6 m deep back-projected from
    in-frame pixel targets, 2.5D labels derived through the geometry core
    (the same contract data/pipeline.py feeds train/finetune.py)."""
    from peclr_tpu.geometry.camera import convert_to_2_5d

    rng = np.random.default_rng(seed)
    fx = rng.uniform(580.0, 620.0, n).astype(np.float32)
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = fx
    K[:, 1, 1] = fx
    K[:, 0, 2] = canvas / 2.0
    K[:, 1, 2] = canvas / 2.0
    K[:, 2, 2] = 1.0
    uv = rng.uniform(0.3 * canvas, 0.7 * canvas, (n, 21, 2)).astype(np.float32)
    z = (0.6 + 0.02 * rng.standard_normal((n, 21))).astype(np.float32)
    joints3d = np.empty((n, 21, 3), np.float32)
    joints3d[..., 0] = (uv[..., 0] - K[:, None, 0, 2]) * z / fx[:, None]
    joints3d[..., 1] = (uv[..., 1] - K[:, None, 1, 2]) * z / fx[:, None]
    joints3d[..., 2] = z
    joints25d, scale = convert_to_2_5d(jnp.asarray(K), jnp.asarray(joints3d))
    return {
        "image": jax.device_put(
            rng.integers(0, 256, size=(n, canvas, canvas, 3), dtype=np.uint8)
        ),
        "joints25d": joints25d,
        "joints3d": jax.device_put(joints3d),
        "K": jax.device_put(K),
        "scale": scale,
        "joints_valid": jax.device_put(np.ones((n, 21, 1), np.float32)),
    }


def synthetic_pretrain_batch(n: int, canvas: int = 224, seed: int = 0,
                             sharding=None):
    """Synthetic uint8 canvases + plausible keypoints, device-resident."""
    rng = np.random.default_rng(seed)
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jax.device_put
    return {
        "image": put(
            rng.integers(0, 256, size=(n, canvas, canvas, 3), dtype=np.uint8)
        ),
        "joints25d": put(
            np.concatenate(
                [
                    rng.uniform(
                        0.27 * canvas, 0.71 * canvas, (n, 21, 2)
                    ).astype(np.float32),
                    rng.normal(size=(n, 21, 1)).astype(np.float32),
                ],
                axis=-1,
            )
        ),
    }
