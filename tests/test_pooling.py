"""Custom-vjp max pool: forward/backward parity with flax autodiff and with
torch's MaxPool2d tie semantics (the backward routes each output gradient to
exactly ONE window position — the first row-major argmax)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.ops.pooling import _max_pool_custom, max_pool_3x3s2p1

# both backends must agree: the default XLA reduce_window path and the
# hand-written custom-vjp backward (PECLR_MAXPOOL=custom)
BACKENDS = [max_pool_3x3s2p1, _max_pool_custom]


def _flax_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


@pytest.mark.parametrize("pool", BACKENDS)
@pytest.mark.parametrize("hw", [(64, 64), (63, 65), (8, 8)])
def test_forward_matches_flax(hw, pool):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *hw, 5)).astype(np.float32))
    np.testing.assert_array_equal(pool(x), _flax_pool(x))


@pytest.mark.parametrize("pool", BACKENDS)
@pytest.mark.parametrize("hw", [(64, 64), (63, 65)])
def test_grad_matches_autodiff(hw, pool):
    # no exact ties in continuous random data -> grads must match exactly
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, *hw, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=_flax_pool(x).shape).astype(np.float32))
    mine = jax.vjp(pool, x)[1](g)[0]
    ref = jax.vjp(_flax_pool, x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("pool", BACKENDS)
def test_tie_semantics_match_torch(pool):
    # post-ReLU feature maps are full of exact 0.0 ties; torch routes the
    # gradient to the argmax index (one position), never splits it
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x_np = np.maximum(rng.normal(size=(2, 16, 16, 4)), 0).astype(np.float32)
    # make whole regions exactly zero so most windows tie
    x_np[:, 4:12, 4:12, :] = 0.0
    g_np = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)

    xt = torch.tensor(np.moveaxis(x_np, -1, 1), requires_grad=True)
    out = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    out.backward(torch.tensor(np.moveaxis(g_np, -1, 1)))
    ref = np.moveaxis(xt.grad.numpy(), 1, -1)

    mine = jax.vjp(pool, jnp.asarray(x_np))[1](jnp.asarray(g_np))[0]
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-6)


@pytest.mark.parametrize("pool", BACKENDS)
def test_bf16_roundtrip(pool):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 8)), dtype=jnp.bfloat16)
    out, vjp = jax.vjp(pool, x)
    assert out.dtype == jnp.bfloat16
    (gx,) = vjp(jnp.ones_like(out))
    assert gx.shape == x.shape and bool(jnp.isfinite(gx.astype(jnp.float32)).all())
