"""3x3/2 max pool (the torchvision resnet stem pool,
src/models/resnet_model.py:16-26) with measured backend selection.

Default backend is plain `lax.reduce_window(max)` + XLA autodiff
(SelectAndScatter backward): on the v5e it BEAT both hand-written
elementwise backwards that were tried (RN50 PeCLR recipe, img/s/chip:
XLA 3085, output-sized parity-interleave backward 2933, input-sized 9-way
dilate-add 2736 — BENCHLOG.md round 2), and its tie routing matches torch's
first-row-major-argmax exactly (tests/test_pooling.py).

PECLR_MAXPOOL=custom selects the hand-written custom-vjp backward (the
output-sized formulation, kept because it is the faster option on backends
without a native SelectAndScatter and it documents the exact gradient
semantics):

    for each window offset (dy, dx) in row-major order:
        claim[i, j] = (x_pad[2i+dy, 2j+dx] == out[i, j]) and not yet claimed
    input y receives dy=1 row y/2 when even, dy=0 row (y+1)/2 + dy=2 row
    (y-1)/2 when odd (same in x) — output-sized grid sums interleaved by
    parity, no scatter.

"First match" reproduces torch's tie behavior (exactly one window position
receives each output gradient; ties are common at exactly-0.0 post-ReLU
activations, where tie-splitting would multiply gradients by up to 9x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _forward(x):
    # float-only (the backward pads with -inf); the encoder feeds bf16/f32
    assert jnp.issubdtype(x.dtype, jnp.floating), x.dtype
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def _max_pool_custom(x):
    return _forward(x)


def max_pool_3x3s2p1(x):
    """max_pool(window 3x3, stride 2, padding 1) over NHWC.

    PECLR_MAXPOOL=custom selects the hand-written backward (see module
    docstring for the measured A/B).
    """
    import os

    if os.environ.get("PECLR_MAXPOOL") == "custom":
        return _max_pool_custom(x)
    return _forward(x)


def _fwd(x):
    out = _forward(x)
    return out, (x, out)


def _claimed_grids(x, out, g):
    """c[dy][dx][b, i, j, ch] = g routed to window (i, j)'s offset (dy, dx)
    under first-row-major-argmax claim order.  All output-sized."""
    b, h, w, c = x.shape
    _, oh, ow, _ = out.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    grids = [[None] * 3 for _ in range(3)]
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
            grids[dy][dx] = jnp.where(claim, g, 0)
    return grids


def _bwd(res, g):
    """Input position (y, x) belongs to window (i, j) at offset
    (dy, dx) = (y + 1 - 2i, x + 1 - 2j): even y receives only the dy=1 grid
    row y/2; odd y receives dy=0 row (y+1)/2 and dy=2 row (y-1)/2 (same in
    x) — so the whole backward is output-sized grid sums interleaved by
    parity, with no input-sized accumulation (an input-sized 9-way
    dilate-and-add measured ~75 ms/step in the RN50 PeCLR recipe)."""
    x, out = res
    b, h, w, c = x.shape
    _, oh, ow, _ = out.shape
    if h != 2 * oh or w != 2 * ow:
        return (_bwd_general(x, out, g),)
    grids = _claimed_grids(x, out, g)

    def up(a):  # row Y <- row Y+1, zero at the end
        return jnp.pad(a[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))

    def left(a):
        return jnp.pad(a[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))

    # combine over dy per row parity (0: even input rows, 1: odd)
    rows = [
        [grids[1][dx] for dx in range(3)],
        [up(grids[0][dx]) + grids[2][dx] for dx in range(3)],
    ]
    # then over dx per column parity
    blocks = [
        [r[1], left(r[0]) + r[2]] for r in rows
    ]  # blocks[py][px]: (b, oh, ow, c), input (y, x) = (2Y+py, 2X+px)
    stacked = jnp.stack(
        [jnp.stack(bp, axis=3) for bp in blocks], axis=2
    )  # (b, oh, 2, ow, 2, c)
    return (stacked.reshape(b, h, w, c),)


def _bwd_general(x, out, g):
    """Odd-sized fallback: 9-way zero-dilate accumulation (input-sized)."""
    b, h, w, c = x.shape
    _, oh, ow, _ = out.shape
    ph, pw = h + 2, w + 2
    grids = _claimed_grids(x, out, g)
    g_pad = jnp.zeros((b, ph, pw, c), g.dtype)
    for dy in range(3):
        for dx in range(3):
            cg = grids[dy][dx]
            d = cg[:, :, None, :, None, :]
            d = jnp.pad(d, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
            d = d.reshape(b, 2 * oh, 2 * ow, c)
            end_h = min(ph, dy + 2 * oh)
            end_w = min(pw, dx + 2 * ow)
            d = d[:, : end_h - dy, : end_w - dx, :]
            g_pad = g_pad + jnp.pad(
                d, ((0, 0), (dy, ph - end_h), (dx, pw - end_w), (0, 0))
            )
    return g_pad[:, 1 : h + 1, 1 : w + 1, :]


_max_pool_custom.defvjp(_fwd, _bwd)
