"""Inference-session tests: fixed-batch padding/chunking, checkpoint load."""

import numpy as np

from peclr_tpu.eval.serving import InferenceSession


def test_padding_and_chunking(rng, tmp_path):
    import jax
    import jax.numpy as jnp

    from peclr_tpu.models import RN25DPose, port

    model = RN25DPose(size="50")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    sd = port.variables_to_rn25d_checkpoint(variables, "50")
    path = str(tmp_path / "rn50.npz")
    np.savez(path, **sd)

    sess = InferenceSession.from_checkpoint(
        path, "50", batch_size=4, image_size=64
    ).warmup()

    imgs = rng.integers(0, 256, (7, 64, 64, 3), dtype=np.uint8)
    out = sess.predict(imgs)
    assert out["kp3d"].shape == (7, 21, 3)
    assert np.isfinite(out["kp3d"]).all()

    # padding must not change results for the same inputs
    out3 = sess.predict(imgs[:3])
    np.testing.assert_allclose(out3["kp25d"], out["kp25d"][:3], atol=1e-5)
