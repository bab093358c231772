"""Model + checkpoint-port tests: forward parity against a torch functional
oracle, port round trips, and head semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.models import (
    EMBED_DIM,
    PeCLRModel,
    RN25DPose,
    ResNetEncoder,
)
from peclr_tpu.models import port


def init_encoder(size, rng_seed=0, image=32):
    model = ResNetEncoder(size=size)
    variables = model.init(
        jax.random.PRNGKey(rng_seed), jnp.zeros((1, image, image, 3)), train=False
    )
    return model, variables


def randomize_batch_stats(variables, rng):
    """Give running stats non-trivial values so BN parity is actually tested."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for k, v in flat.items():
        if k[-1] == "mean":
            out[k] = jnp.asarray(rng.normal(0, 0.3, v.shape).astype(np.float32))
        elif k[-1] == "var":
            out[k] = jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
        elif k[-1] in ("scale",):
            out[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        elif k[-1] == "bias":
            out[k] = jnp.asarray(rng.normal(0, 0.1, v.shape).astype(np.float32))
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(out)


class TestResNetTorchParity:
    @pytest.mark.parametrize("size", ["18", "50"])
    def test_forward_matches_torch_oracle(self, rng, size):
        torch = pytest.importorskip("torch")
        from tests.torch_resnet_ref import torch_resnet_forward

        _, variables = init_encoder(size)
        variables = randomize_batch_stats(variables, rng)
        sd = port.encoder_to_torchvision(variables, size)

        x = rng.normal(0, 1, size=(2, 48, 48, 3)).astype(np.float32)
        ours = ResNetEncoder(size=size).apply(variables, jnp.asarray(x), train=False)
        theirs = torch_resnet_forward(
            sd, size, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("size", ["18", "34", "50"])
    def test_port_roundtrip_exact(self, size):
        _, variables = init_encoder(size)
        sd = port.encoder_to_torchvision(variables, size)
        back = port.torchvision_to_encoder(sd, size)
        import flax

        a = flax.traverse_util.flatten_dict(variables)
        b = flax.traverse_util.flatten_dict(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=str(k))

    def test_torchvision_key_names(self):
        """Exported keys must exactly match torchvision's resnet50 naming."""
        _, variables = init_encoder("50")
        sd = port.encoder_to_torchvision(variables, "50")
        assert "conv1.weight" in sd
        assert "layer1.0.downsample.0.weight" in sd
        assert "layer1.0.downsample.1.running_var" in sd
        assert "layer4.2.bn3.num_batches_tracked" in sd
        assert "layer2.0.conv2.weight" in sd
        # shapes follow torch OIHW
        assert sd["conv1.weight"].shape == (64, 3, 7, 7)
        assert sd["layer1.0.conv2.weight"].shape == (64, 64, 3, 3)

    def test_peclr_checkpoint_roundtrip(self):
        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        sd = port.variables_to_peclr_checkpoint(variables, "18")
        assert "encoder.features.0.weight" in sd
        assert "encoder.features.4.0.conv1.weight" in sd
        assert "projection_head.0.weight" in sd
        assert "projection_head.3.weight" in sd
        back = port.peclr_checkpoint_to_variables(sd, "18")
        import flax

        a = flax.traverse_util.flatten_dict(variables)
        b = flax.traverse_util.flatten_dict(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestPeCLRModel:
    def test_forward_shapes(self):
        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
        )
        out = model.apply(variables, jnp.ones((4, 32, 32, 3)), train=False)
        assert out["embedding"].shape == (4, EMBED_DIM["18"])
        assert out["projection"].shape == (4, 128)

    def test_train_mode_updates_batch_stats(self):
        model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
        )
        _, mutated = model.apply(
            variables,
            jnp.ones((2, 32, 32, 3)),
            train=True,
            mutable=["batch_stats"],
        )
        assert "batch_stats" in mutated


class TestRN25D:
    def test_forward_semantics(self, rng):
        model = RN25DPose(size="50")
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out["kp3d"].shape == (2, 21, 3)
        # wrist relative depth is clamped to zero
        np.testing.assert_allclose(np.asarray(out["zrel"][:, 0, 0]), 0.0)
        np.testing.assert_allclose(np.asarray(out["kp25d"][:, 0, 2]), 0.0)
        # z-root >= 4 (clamp) => kp3d z positive
        assert np.all(np.asarray(out["kp3d"][:, 0, 2]) >= 3.9)

    def test_rn25d_port_roundtrip(self):
        model = RN25DPose(size="50")
        variables = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False
        )
        sd = port.variables_to_rn25d_checkpoint(variables, "50")
        assert "backend_model.conv1.weight" in sd
        assert "backend_model.fc.weight" in sd
        assert sd["backend_model.fc.weight"].shape == (64, 2048)
        assert "zroot_ref.zroot_ref.0.weight" in sd
        assert "zroot_ref.zroot_ref.6.bias" in sd
        back = port.rn25d_checkpoint_to_variables(sd, "50")
        import flax

        a = flax.traverse_util.flatten_dict(variables)
        b = flax.traverse_util.flatten_dict(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestLargeResNets:
    """Flagship-size encoders compile and produce the right embedding."""

    @pytest.mark.parametrize("size", ["101", "152"])
    def test_forward_shapes(self, size):
        model, variables = init_encoder(size, image=32)
        out = ResNetEncoder(size=size).apply(
            variables, jnp.ones((1, 32, 32, 3)), train=False
        )
        assert out.shape == (1, EMBED_DIM[size])

    def test_rn152_port_keys(self):
        _, variables = init_encoder("152", image=32)
        sd = port.encoder_to_torchvision(variables, "152")
        # 152 = 3+8+36+3 bottlenecks
        assert "layer3.35.conv3.weight" in sd
        assert "layer2.7.bn2.running_mean" in sd
