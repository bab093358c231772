"""Reproducibility: same seed -> identical training trajectory; plus the
ResNetPose (non-pretraining head) variant."""

import jax
import jax.numpy as jnp
import numpy as np

from peclr_tpu.models import ResNetPose


def test_training_deterministic_given_seed():
    from tests.test_train_step import tiny_setup

    losses = []
    for _ in range(2):
        _, state, step, batch = tiny_setup(batch=4)
        seq = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            seq.append(float(m["loss"]))
        losses.append(seq)
    np.testing.assert_array_equal(losses[0], losses[1])


def test_resnet_pose_head():
    """The reference ResNetModel's non-pretraining mode: 21*3 keypoints +
    scale logit (resnet_model.py:45-55)."""
    model = ResNetPose(size="18")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    out = model.apply(variables, jnp.ones((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 21 * 3 + 1)
    kp25d, scale = out[:, : 21 * 3], out[:, -1]
    assert kp25d.shape == (2, 63) and scale.shape == (2,)
