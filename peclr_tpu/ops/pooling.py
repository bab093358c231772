"""TPU-fast 3x3/2 max pool with a hand-written backward.

XLA differentiates `lax.reduce_window(max)` into a `SelectAndScatter` op,
which lowers to a slow serial pattern on TPU (it was ~12 ms/step of the RN50
PeCLR microbatch — BENCHLOG.md trace table).  The backward here is the
first-argmax-match formulation torch uses (reference encoder parity:
torchvision resnet maxpool, src/models/resnet_model.py:16-26):

    for each window offset (dy, dx) in row-major order:
        claim[i, j] = (x_pad[2i+dy, 2j+dx] == out[i, j]) and not yet claimed
        g_in[2i+dy-1, 2j+dx-1] += claim[i, j] * g[i, j]

Nine shifted compares + strided zero-dilations — pure elementwise work that
XLA fuses, no SelectAndScatter.  "First match" reproduces torch's tie
behavior (exactly one window position receives each output gradient; ties
are common at exactly-0.0 post-ReLU activations, where tie-splitting would
multiply gradients by up to 9x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _forward(x):
    b, h, w, c = x.shape
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3s2p1(x):
    """max_pool(window 3x3, stride 2, padding 1) over NHWC."""
    return _forward(x)


def _fwd(x):
    out = _forward(x)
    return out, (x, out)


def _bwd(res, g):
    x, out = res
    b, h, w, c = x.shape
    _, oh, ow, _ = out.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    ph, pw = h + 2, w + 2

    g_pad = jnp.zeros((b, ph, pw, c), g.dtype)
    found = jnp.zeros(out.shape, bool)
    for dy in range(3):
        for dx in range(3):
            win = lax.slice(
                xp, (0, dy, dx, 0), (b, dy + 2 * oh - 1, dx + 2 * ow - 1, c),
                (1, 2, 2, 1),
            )
            hit = win == out
            claim = hit & ~found
            found = found | hit
            cg = jnp.where(claim, g, 0)
            # zero-dilate by 2 in H and W, then offset to (dy, dx)
            d = cg[:, :, None, :, None, :]
            d = jnp.pad(d, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
            d = d.reshape(b, 2 * oh, 2 * ow, c)
            end_h = min(ph, dy + 2 * oh)
            end_w = min(pw, dx + 2 * ow)
            d = d[:, : end_h - dy, : end_w - dx, :]
            g_pad = g_pad + jnp.pad(
                d,
                ((0, 0), (dy, ph - end_h), (dx, pw - end_w), (0, 0)),
            )
    return (g_pad[:, 1 : h + 1, 1 : w + 1, :],)


max_pool_3x3s2p1.defvjp(_fwd, _bwd)
