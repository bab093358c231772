"""Model heads: SimCLR projection MLP and the z-root refinement MLP.

Reference: src/models/unsupervised/simclr_model.py:20-35 (projection head:
Linear(embed->512, bias) -> BN -> ReLU -> Linear(512->128, no bias)) and
src/models/rn_25D_wMLPref.py:6-72 (ZrootMLP_ref: closed-form z-root from the
middle_mcp<->middle_pip bone + residual MLP refinement, arXiv:2003.09282).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from peclr_tpu.models.resnet import BN_MOMENTUM


class ProjectionHead(nn.Module):
    """2-layer projection MLP.  Param names lin1/bn/lin2 map onto the torch
    Sequential indices 0/1/3 (see models/port.py)."""

    hidden_dim: int = 512
    output_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="lin1"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.output_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="lin2",
        )(x)
        return x.astype(jnp.float32)


class ZrootRefineMLP(nn.Module):
    """Closed-form scale-normalized root depth + residual MLP refinement.

    Input: kp3d_unnorm (B, 21, 3) back-projected homogeneous rays, zrel
    (B, 21, 1).  The z-root quadratic (Iqbal et al. eq 6-7) is anchored on
    the middle_mcp (3) <-> middle_pip (8) bone with unit-length constraint;
    the estimate is clamped to [4, 50], detached, and refined by
    zroot + mlp([zrel(21), xy_unnorm(42), zroot(1)]).
    """

    norm_bone: tuple = (3, 8)
    eps: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kp3d_unnorm, zrel, train: bool = False):
        m, n = self.norm_bone
        X_m, Y_m = kp3d_unnorm[:, m, 0], kp3d_unnorm[:, m, 1]
        X_n, Y_n = kp3d_unnorm[:, n, 0], kp3d_unnorm[:, n, 1]
        z_m = zrel[:, m, 0]
        z_n = zrel[:, n, 0]

        a = (X_n - X_m) ** 2 + (Y_n - Y_m) ** 2
        b = 2.0 * (
            z_n * (X_n**2 + Y_n**2 - X_n * X_m - Y_n * Y_m)
            + z_m * (X_m**2 + Y_m**2 - X_n * X_m - Y_n * Y_m)
        )
        c = (
            (X_n * z_n - X_m * z_m) ** 2
            + (Y_n * z_n - Y_m * z_m) ** 2
            + (z_n - z_m) ** 2
            - 1.0
        )
        a = jnp.maximum(a, self.eps)
        d = jnp.maximum(b * b - 4.0 * a * c, self.eps)
        zroot = (-b + jnp.sqrt(d)) / (2.0 * a)
        zroot = jax_stop_gradient(zroot)
        zroot = jnp.clip(zroot, 4.0, 50.0)

        mlp_in = jnp.concatenate(
            [
                zrel.reshape(-1, 21),
                kp3d_unnorm[..., :2].reshape(-1, 42),
                zroot.reshape(-1, 1),
            ],
            axis=1,
        )

        h = nn.Dense(128, param_dtype=jnp.float32, name="lin1")(mlp_in)
        h = _bn1d(train, "bn1")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Dense(128, param_dtype=jnp.float32, name="lin2")(h)
        h = _bn1d(train, "bn2")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        delta = nn.Dense(1, param_dtype=jnp.float32, name="lin3")(h)
        return zroot + delta[:, 0]


class Denoiser(nn.Module):
    """Z-root denoiser MLP: (21 zrel + 42 2D + 1 scale logit = 64) -> 128 ->
    128 -> 1 refined z-root (reference get_denoiser,
    src/models/utils.py:379-388; consumed by the evaluation suite when a
    model carries a denoiser)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(128, param_dtype=jnp.float32, name="lin1")(x)
        h = _bn1d(train, "bn1")(h)
        h = nn.relu(h)
        h = nn.Dense(128, param_dtype=jnp.float32, name="lin2")(h)
        h = _bn1d(train, "bn2")(h)
        h = nn.relu(h)
        return nn.Dense(1, param_dtype=jnp.float32, name="lin3")(h)


def _bn1d(train, name):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=1e-5,
        param_dtype=jnp.float32,
        name=name,
    )


def jax_stop_gradient(x):
    import jax

    return jax.lax.stop_gradient(x)
