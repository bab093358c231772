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
