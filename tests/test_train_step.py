"""Train-step tests: end-to-end jitted PeCLR step (augment -> encode ->
equivariant NT-Xent -> LARS/Adam update) on tiny shapes, plus sharded
execution on the virtual mesh."""



import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.config.defaults import (
    AugmentationFlags,
    AugmentationParams,
    peclr_pretrain_flags,
)
from peclr_tpu.models import PeCLRModel
from peclr_tpu.train.optimizer import build_optimizer, no_decay_mask, scaled_lr
from peclr_tpu.train.state import TrainState
from peclr_tpu.train.step import make_peclr_train_step


def tiny_setup(accum=1, batch=4, canvas=64, optimizer="LARS"):
    model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    tx, sched = build_optimizer(
        variables["params"],
        base_lr=1e-3,
        batch_size=batch,
        accum=accum,
        steps_per_epoch=10,
        epochs=5,
        warmup_epochs=1,
        optimizer=optimizer,
    )
    state = TrainState.create(variables, tx)
    flags = peclr_pretrain_flags()
    params = AugmentationParams(resize_shape=(32, 32))
    step = make_peclr_train_step(
        model, tx, flags, params, accum=accum, donate=False
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(batch * accum, canvas, canvas, 3),
                          dtype=np.uint8)
    joints = np.zeros((batch * accum, 21, 3), np.float32)
    joints[..., 0] = rng.uniform(16, 48, (batch * accum, 21))
    joints[..., 1] = rng.uniform(16, 48, (batch * accum, 21))
    batch_dict = {"image": jnp.asarray(images), "joints25d": jnp.asarray(joints)}
    return model, state, step, batch_dict


class TestTrainStep:
    def test_single_step_runs_and_updates(self):
        _, state, step, batch = tiny_setup()
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        # warmup starts at lr=0 (warmup_start_lr=0 semantics), so step 1 has
        # zero update; by step 2 the lr is nonzero and params must move
        new_state2, _ = step(new_state, batch, jax.random.PRNGKey(2))
        delta = jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).sum()),
                new_state.params, new_state2.params,
            ),
        )
        assert delta > 0
        # projection stats logged
        assert "proj1x_mean" in metrics and "proj2y_max" in metrics

    def test_grad_accumulation_shapes(self):
        _, state, step, batch = tiny_setup(accum=2, batch=2)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_loss_decreases_on_fixed_batch(self):
        _, state, step, batch = tiny_setup(batch=8)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(6):
            state, metrics = step(state, batch, key)  # same batch + same aug
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_sharded_step_runs(self, mesh8):
        from peclr_tpu.parallel.mesh import shard_batch

        _, state, step, batch = tiny_setup(batch=8)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec())
        )
        batch = shard_batch(mesh8, batch)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_equals_unsharded_full_step(self, mesh8):
        """Program-level global-batch guarantee (VERDICT r2 item 4): the
        COMPLETE train step — augment RNG, BN batch stats, NT-Xent with
        global negatives, grad mean, LARS update — run 8-way batch-sharded
        must equal the single-device run on the same global batch and key,
        up to reduction-order float noise (the reference's single-GPU
        semantics, models/utils.py:171-186)."""
        from peclr_tpu.parallel.mesh import replicated, shard_batch

        _, state0, step, batch = tiny_setup(batch=8, accum=2)
        key = jax.random.PRNGKey(7)

        # two chained steps: warmup lr is 0 at step 1, so only the second
        # step moves params — the comparison must cover a real update
        ref_state, _ = step(state0, batch, key)
        ref_state, ref_metrics = step(
            ref_state, batch, jax.random.fold_in(key, 1)
        )
        ref_loss = float(ref_metrics["loss"])

        sh_state = jax.device_put(state0, replicated(mesh8))
        sh_batch = shard_batch(mesh8, batch)
        out_state, _ = step(sh_state, sh_batch, key)
        out_state, out_metrics = step(
            out_state, sh_batch, jax.random.fold_in(key, 1)
        )

        assert float(out_metrics["loss"]) == pytest.approx(ref_loss, rel=1e-5)
        # Updated params: sharded-vs-unsharded divergence must be a small
        # fraction of the applied UPDATE (random-init NT-Xent gradients are
        # ill-conditioned, so f32 reduction-order noise shows up in the
        # gradient direction — see TestGradAccumSemantics — making
        # per-element rtol the wrong yardstick).  One leaf is exempt:
        # projection_head/lin1/bias feeds straight into BatchNorm, so the
        # loss is EXACTLY invariant to it — its gradient is pure f32
        # cancellation noise that LARS renormalizes to a full-size update
        # whose direction legitimately differs per reduction order.
        paths0 = jax.tree_util.tree_flatten_with_path(
            jax.device_get(state0.params)
        )[0]
        for (kp, p0), a, b in zip(
            paths0,
            jax.tree_util.tree_leaves(jax.device_get(ref_state.params)),
            jax.tree_util.tree_leaves(jax.device_get(out_state.params)),
        ):
            keystr = jax.tree_util.keystr(kp)
            if "projection_head" in keystr and "lin1" in keystr \
                    and "bias" in keystr:
                continue
            update = np.linalg.norm(np.asarray(a) - np.asarray(p0))
            diverge = np.linalg.norm(np.asarray(a) - np.asarray(b))
            assert diverge <= 0.05 * update + 1e-7, (
                keystr, diverge, update
            )
        # BN batch stats are plain means/vars (well-conditioned): tight
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(ref_state.batch_stats)),
            jax.tree_util.tree_leaves(jax.device_get(out_state.batch_stats)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            )


class TestOptimizer:
    def test_no_decay_mask(self):
        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        import flax

        mask = flax.traverse_util.flatten_dict(
            no_decay_mask(variables["params"])
        )
        # conv kernels decay
        assert mask[("encoder", "conv1", "kernel")] is True
        # BN scale/bias and linear bias do not
        assert mask[("encoder", "bn1", "scale")] is False
        assert mask[("encoder", "bn1", "bias")] is False
        assert mask[("projection_head", "lin1", "bias")] is False
        assert mask[("projection_head", "bn", "scale")] is False
        assert mask[("projection_head", "lin1", "kernel")] is True

    def test_scaled_lr(self):
        np.testing.assert_allclose(
            scaled_lr(1e-4, 128, 16), 1e-4 * np.sqrt(2048), rtol=1e-9
        )

    def test_schedule_warmup_then_decay(self):
        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        _, sched = build_optimizer(
            variables["params"], 1e-4, 128, 1, steps_per_epoch=100, epochs=10,
            warmup_epochs=2, optimizer="LARS",
        )
        peak = scaled_lr(1e-4, 128, 1)
        assert float(sched(0)) < 1e-6
        np.testing.assert_allclose(float(sched(200)), peak, rtol=1e-3)
        assert float(sched(999)) < peak * 0.01


class TestGradAccumSemantics:
    def test_stats_accum_outside_matches_carry(self):
        """stats_accum="outside" (zero-stat applies + closed-form momentum
        replay, the default — BENCHLOG round 4) must reproduce the "carry"
        chain exactly: bit-equal losses/params/opt state (the grads path is
        untouched) and BN running stats to f32 rounding of the reordered
        momentum recurrence."""
        from peclr_tpu.config.defaults import AugmentationParams
        from peclr_tpu.models import PeCLRModel

        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        # seed nontrivial running stats so the m^A * r_0 term is exercised
        variables = {
            "params": variables["params"],
            "batch_stats": jax.tree_util.tree_map(
                lambda s: s + 0.25, variables["batch_stats"]
            ),
        }
        import optax

        tx = optax.adam(1e-3)
        state = TrainState.create(variables, tx)
        flags = peclr_pretrain_flags()
        aug = AugmentationParams(resize_shape=(32, 32))
        rng = np.random.default_rng(7)
        batch_dict = {
            "image": jnp.asarray(rng.integers(
                0, 256, (16, 64, 64, 3), dtype=np.uint8)),
            "joints25d": jnp.asarray(
                rng.uniform(16, 48, (16, 21, 3)).astype(np.float32)),
        }
        key = jax.random.PRNGKey(11)
        outs = {}
        for mode in ("carry", "outside"):
            step = make_peclr_train_step(
                model, tx, flags, aug, accum=4, donate=False,
                with_stats=False, stats_accum=mode,
            )
            s2, m = step(state, batch_dict, key)
            outs[mode] = (s2, float(m["loss"]))
        assert outs["carry"][1] == outs["outside"][1]
        for getter, exact in ((lambda s: s.params, True),
                              (lambda s: s.opt_state, True),
                              (lambda s: s.batch_stats, False)):
            for a, b in zip(
                jax.tree_util.tree_leaves(getter(outs["carry"][0])),
                jax.tree_util.tree_leaves(getter(outs["outside"][0])),
            ):
                a = np.asarray(a, np.float64)
                b = np.asarray(b, np.float64)
                if exact:
                    assert np.array_equal(a, b)
                else:
                    # the replayed chain reorders the momentum recurrence:
                    # f32 rounding differs by ~2e-5 of the leaf's scale
                    # (per-ENTRY relative error is meaningless for
                    # near-zero variance entries)
                    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
                    assert rel < 1e-4, rel

    def test_accum_width_bit_equal(self, monkeypatch):
        """accum_width computes W independent microbatch chains per scan
        iteration (a scheduler-interleaving lever — BENCHLOG round 4) but
        keeps the accumulation ORDER of width 1, so losses, params and
        running stats must all be bit-equal."""
        monkeypatch.setenv("PECLR_ACCUM_WIDTH", "1")
        _, state, step1, batch = tiny_setup(accum=4, batch=2)
        key = jax.random.PRNGKey(1)
        s1, m1 = step1(state, batch, key)
        s1, m1 = step1(s1, batch, key)

        for width in ("2", "4"):
            monkeypatch.setenv("PECLR_ACCUM_WIDTH", width)
            _, state_w, step_w, batch_w = tiny_setup(accum=4, batch=2)
            sw, mw = step_w(state_w, batch_w, key)
            sw, mw = step_w(sw, batch_w, key)
            assert float(mw["loss"]) == float(m1["loss"]), width
            for getter in (lambda s: s.params, lambda s: s.batch_stats):
                diffs = jax.tree_util.tree_map(
                    lambda a, b: float(jnp.max(jnp.abs(a - b))),
                    getter(s1), getter(sw),
                )
                assert max(jax.tree_util.tree_leaves(diffs)) == 0.0, (
                    width, diffs,
                )

    def test_accum_width_validation(self):
        from peclr_tpu.config.defaults import AugmentationParams
        from peclr_tpu.models import PeCLRModel
        import optax

        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        flags = peclr_pretrain_flags()
        aug = AugmentationParams(resize_shape=(32, 32))
        tx = optax.adam(1e-3)
        with pytest.raises(ValueError, match="divide"):
            make_peclr_train_step(
                model, tx, flags, aug, accum=4, accum_width=3
            )
        with pytest.raises(ValueError, match="outside"):
            make_peclr_train_step(
                model, tx, flags, aug, accum=4, accum_width=2,
                stats_accum="carry",
            )

    def test_pack_threshold_override_is_equivalent(self, monkeypatch):
        """PECLR_PACK_SMALL_ELEMS only relocates small leaves between the
        packed flat carry and the per-leaf carry (a data-movement choice,
        re-A/B'd on-chip as scheduler defaults evolve — BENCHLOG round 4);
        0 (per-leaf) and the 8192 default must produce the same step."""
        _, state, _, batch = tiny_setup(accum=2, batch=2)
        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        flags = peclr_pretrain_flags()
        aug = AugmentationParams(resize_shape=(32, 32))
        import optax

        tx = optax.adam(1e-3)
        state = TrainState.create(
            {"params": state.params, "batch_stats": state.batch_stats}, tx
        )
        key = jax.random.PRNGKey(3)
        outs = {}
        for pack in ("0", "8192"):
            monkeypatch.setenv("PECLR_PACK_SMALL_ELEMS", pack)
            step = make_peclr_train_step(
                model, tx, flags, aug, accum=2, donate=False,
                with_stats=False,
            )
            s2, m = step(state, batch, key)
            outs[pack] = (s2, float(m["loss"]))
        assert outs["0"][1] == outs["8192"][1]
        for a, b in zip(
            jax.tree_util.tree_leaves(outs["0"][0].params),
            jax.tree_util.tree_leaves(outs["8192"][0].params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
            )

    def test_accum_equals_mean_of_microbatch_grads(self, monkeypatch):
        """One accum=2 step must apply the MEAN of the two microbatch
        gradients (reference accumulate_grad_batches semantics).

        Isolation choices: the augmentation is a smooth deterministic stub
        (the real warp's trunc/floor boundaries are not bitwise-stable
        across compilation contexts) and the encoder is a tiny linear model
        (a random-init deep net's NT-Xent gradients are ill-conditioned —
        projections nearly collapse, so f32 noise dominates direction)."""
        import flax.linen as nn
        import optax

        import peclr_tpu.train.step as step_mod
        from peclr_tpu.config.defaults import AugmentationParams
        from peclr_tpu.ops.augment import AugmentOutput

        class TinyModel(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                h = x.reshape(x.shape[0], -1)
                proj = nn.Dense(16, name="proj")(jnp.tanh(h / 100.0))
                return {"embedding": h, "projection": proj}

        def stub_augment_pair(key, images, joints, flags_, params_,
                              normalize=True):
            b = images.shape[0]
            shift = jax.random.uniform(key, (2,))

            def view(i):
                img = images[:, :8, :8, :].astype(jnp.float32) / 255.0
                img = img + shift[i]
                p = {
                    "angle": jnp.full((b,), 10.0 * (i + 1)),
                    "jitter_x": jnp.full((b,), -2.0 * (i + 1)),
                    "jitter_y": jnp.full((b,), -1.0),
                }
                return AugmentOutput(
                    images=img, joints=joints,
                    matrix=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)), params=p,
                )

            return view(0), view(1)

        monkeypatch.setattr(step_mod, "augment_pair", stub_augment_pair)

        model = TinyModel()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        if "batch_stats" not in variables:
            variables = {"params": variables["params"], "batch_stats": {}}
        tx = optax.sgd(1.0)  # update == -grad: params expose the gradient
        state = TrainState.create(variables, tx)
        flags = peclr_pretrain_flags()
        aug = AugmentationParams(resize_shape=(8, 8))

        rng = np.random.default_rng(3)
        images = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
        joints = rng.uniform(2, 6, (4, 21, 3)).astype(np.float32)
        batch = {"image": jnp.asarray(images), "joints25d": jnp.asarray(joints)}
        key = jax.random.PRNGKey(9)

        step2 = step_mod.make_peclr_train_step(
            model, tx, flags, aug, accum=2, donate=False
        )
        new_state, _ = step2(state, batch, key)
        applied = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a - b), state.params, new_state.params
        )

        from peclr_tpu.losses.equivariance import peclr_projections
        from peclr_tpu.losses.ntxent import ntxent_loss

        def micro_loss(params, im, j, k):
            v1, v2 = stub_augment_pair(k, im, j, flags, aug)
            both = jnp.concatenate([v1.images, v2.images], axis=0)
            out = model.apply({"params": params}, both)
            proj = out["projection"]
            b = proj.shape[0] // 2
            z1, z2 = peclr_projections(
                proj[:b], proj[b:], v1.params, v2.params,
                image_size=(8, 8), augmentations=flags.active(),
            )
            return ntxent_loss(z1, z2)

        keys = jax.random.split(key, 2)
        grads = [
            jax.tree_util.tree_map(
                np.asarray,
                jax.grad(micro_loss)(
                    state.params, batch["image"][h], batch["joints25d"][h], k
                ),
            )
            for h, k in ((slice(0, 2), keys[0]), (slice(2, 4), keys[1]))
        ]
        mean_grad = jax.tree_util.tree_map(
            lambda a, b: (a + b) / 2.0, grads[0], grads[1]
        )
        for a, m in zip(
            jax.tree_util.tree_leaves(applied),
            jax.tree_util.tree_leaves(mean_grad),
        ):
            rel = np.linalg.norm(a - m) / (np.linalg.norm(m) + 1e-8)
            assert rel < 1e-3, (a.shape, rel)


def test_resolve_compiler_options_backend_gating(monkeypatch):
    """TPU-only options must not leak onto CPU/GPU backends (review r2)."""
    import jax

    from peclr_tpu.train import step as step_mod

    assert step_mod.resolve_compiler_options(None) is None
    assert step_mod.resolve_compiler_options({"a": 1}) == {"a": 1}
    for backend, expect in [
        ("cpu", None),
        ("gpu", None),
        ("tpu", step_mod.DEFAULT_TPU_COMPILER_OPTIONS),
        ("axon", step_mod.DEFAULT_TPU_COMPILER_OPTIONS),
    ]:
        monkeypatch.setattr(jax, "default_backend", lambda b=backend: b)
        assert step_mod.resolve_compiler_options("auto") == expect, backend
