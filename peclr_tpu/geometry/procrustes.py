"""Batched similarity-Procrustes alignment on TPU via jnp.linalg.svd.

Finds scale s, rotation R and translation t minimizing ||s·Y·R + t − X||_F
per batch element (reference: src/experiments/evaluation_utils.py:304-351,
which adapts http://stackoverflow.com/a/18927641).  Used for the aligned
kp3d AUC leaderboard metric.
"""

from __future__ import annotations

import jax.numpy as jnp


def procrustes_align(X, Y, eps: float = 1e-12):
    """Align Y to X.  X, Y: (B, N, 3).

    Returns (Y_aligned, R, scale, translation) where
    Y_aligned = normX * trace_ratio * (Y0 @ R) + muX.
    """
    muX = jnp.mean(X, axis=1, keepdims=True)
    muY = jnp.mean(Y, axis=1, keepdims=True)
    X0 = X - muX
    Y0 = Y - muY
    normX = jnp.sqrt(jnp.sum(X0 * X0, axis=(1, 2), keepdims=True)) + eps
    normY = jnp.sqrt(jnp.sum(Y0 * Y0, axis=(1, 2), keepdims=True)) + eps
    X0 = X0 / normX
    Y0 = Y0 / normY
    A = jnp.einsum("bni,bnj->bij", X0, Y0)
    U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
    V = jnp.swapaxes(Vh, -1, -2)
    # Reflection fix: flip the last singular vector where det < 0
    det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", V, U))
    sign = jnp.sign(det)[:, None]
    V = V.at[:, :, -1].multiply(sign)
    s = s.at[:, -1].multiply(sign[:, 0])
    R = jnp.einsum("bij,bkj->bik", V, U)
    trace = jnp.sum(s, axis=1)[:, None, None]
    scale = trace * normX / normY
    translation = muX - scale * jnp.einsum("bni,bij->bnj", muY, R)
    Y_aligned = normX * trace * jnp.einsum("bni,bij->bnj", Y0, R) + muX
    return Y_aligned, R, scale, translation
