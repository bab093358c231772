"""Selective-rematerialization (PECLR_REMAT) equivalence tests.

The remat modes exist purely as a memory-traffic lever (BENCHLOG round 4:
the fwd->bwd BN mean/var staging swarm); they must not change any numerics.
On CPU f32 the recompute is exact arithmetic, so everything is asserted
bit-equal, not approximately equal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import peclr_tpu.models.resnet as resnet_mod
from peclr_tpu.models.resnet import ResNetEncoder

from test_train_step import tiny_setup


def _encoder_run(mode, monkeypatch):
    monkeypatch.setenv("PECLR_REMAT", mode)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
    )
    m = ResNetEncoder(size="18", dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params, stats):
        out, mut = m.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out * out), mut["batch_stats"]

    (loss, stats), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"], variables["batch_stats"]
    )
    return variables, loss, stats, grads


class TestRematModes:
    def test_encoder_bit_equal_across_modes(self, monkeypatch):
        base_vars, base_loss, base_stats, base_grads = _encoder_run(
            "", monkeypatch
        )
        for mode in ("bn", "block"):
            v, loss, stats, grads = _encoder_run(mode, monkeypatch)
            # remat must not change the parameter tree (names or values)
            assert jax.tree_util.tree_structure(
                v["params"]
            ) == jax.tree_util.tree_structure(base_vars["params"])
            assert jax.tree_util.tree_all(
                jax.tree_util.tree_map(
                    lambda a, b: bool(jnp.array_equal(a, b)),
                    base_vars["params"], v["params"],
                )
            ), mode
            assert float(loss) == float(base_loss), mode
            for name, tree in (("grads", (base_grads, grads)),
                               ("stats", (base_stats, stats))):
                diffs = jax.tree_util.tree_map(
                    lambda a, b: float(jnp.max(jnp.abs(a - b))), *tree
                )
                assert max(jax.tree_util.tree_leaves(diffs)) == 0.0, (
                    mode, name, diffs,
                )

    def test_full_train_step_bit_equal(self, monkeypatch):
        """The production path: remat inside the grad-accumulation scan."""
        monkeypatch.delenv("PECLR_REMAT", raising=False)
        _, state0, step, batch = tiny_setup(accum=2, batch=2)
        # two steps so a nonzero-lr update is exercised (step 1 is warmup lr=0)
        key = jax.random.PRNGKey(1)
        s, _ = step(state0, batch, key)
        base_state, base_metrics = step(s, batch, key)

        monkeypatch.setenv("PECLR_REMAT", "bn")
        _, state0_r, step_r, batch_r = tiny_setup(accum=2, batch=2)
        s, _ = step_r(state0_r, batch_r, key)
        remat_state, remat_metrics = step_r(s, batch_r, key)

        assert float(remat_metrics["loss"]) == float(base_metrics["loss"])
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            base_state.params, remat_state.params,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0, diffs

    def test_invalid_mode_raises(self, monkeypatch):
        monkeypatch.setenv("PECLR_REMAT", "everything")
        with pytest.raises(ValueError, match="PECLR_REMAT"):
            resnet_mod.maybe_remat(resnet_mod.BasicBlock)
