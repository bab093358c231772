"""Batched inference session for production serving.

The reference has no serving layer (research repo); this provides the
deployment-side API: load a checkpoint once, compile fixed-shape predict
functions up front, and serve variable-sized requests by padding to the
compiled batch — no recompiles, no host round trips inside a request.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class InferenceSession:
    """2.5D/3D hand-pose inference on fixed compiled batch shapes.

    >>> sess = InferenceSession.from_checkpoint("rn50.npz", "50")
    >>> out = sess.predict(images_u8, K)   # out["kp3d"]: (N, 21, 3)
    """

    def __init__(self, model, variables, batch_size: int = 32,
                 image_size: int = 128):
        import jax
        import jax.numpy as jnp

        from peclr_tpu.ops.image import normalize_imagenet

        self.model = model
        # keep the params resident on device; they are passed to the jit as
        # an ARGUMENT (closure-capturing them would bake ~100 MB of weights
        # into the lowered HLO as constants — slow everywhere, and a hard
        # remote-compile failure on RPC-tunneled TPU backends)
        self.variables = jax.device_put(variables)
        self.batch_size = batch_size
        self.image_size = image_size

        @jax.jit
        def _predict(variables, images_u8, K):
            x = normalize_imagenet(images_u8.astype(jnp.float32) / 255.0)
            return model.apply(variables, x, K=K, train=False)

        self._apply = _predict
        self._jnp = jnp

    def _predict(self, images_u8, K):
        return self._apply(self.variables, images_u8, K)

    @classmethod
    def from_checkpoint(cls, path: str, resnet_size: str = "50",
                        batch_size: int = 32, image_size: int = 128):
        from peclr_tpu.models import RN25DPose, port
        from peclr_tpu.train.checkpoint import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        variables = port.rn25d_checkpoint_to_variables(sd, resnet_size)
        return cls(RN25DPose(size=resnet_size), variables,
                   batch_size=batch_size, image_size=image_size)

    def warmup(self):
        """Force compilation before serving traffic."""
        import jax

        z = np.zeros(
            (self.batch_size, self.image_size, self.image_size, 3), np.uint8
        )
        K = np.broadcast_to(np.eye(3, dtype=np.float32) * 100.0,
                            (self.batch_size, 3, 3)).copy()
        K[:, 2, 2] = 1.0
        jax.block_until_ready(self._predict(z, K)["kp3d"])
        return self

    def predict(self, images_u8: np.ndarray,
                K: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """images_u8: (N, image_size, image_size, 3); N <= compiled batch is
        padded, larger N is chunked.  Returns numpy dict."""
        n = images_u8.shape[0]
        if K is None:
            from peclr_tpu.models.rn25d import K_DEFAULT

            K = np.broadcast_to(np.asarray(K_DEFAULT), (n, 3, 3))
        outs = []
        for start in range(0, n, self.batch_size):
            chunk = images_u8[start: start + self.batch_size]
            Kc = K[start: start + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)]
                )
                Kc = np.concatenate([Kc, np.repeat(Kc[-1:], pad, axis=0)])
            out = self._predict(self._jnp.asarray(chunk), self._jnp.asarray(Kc))
            out = {k: np.asarray(v) for k, v in out.items()}
            if pad:
                out = {k: v[:-pad] for k, v in out.items()}
            outs.append(out)
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
