"""2.5D keypoint pose model with z-root MLP refinement (the fine-tune /
leaderboard model).

ResNet-50/152 backbone with a 3*21+1 linear head; the 2.5D output is lifted
to scale-normalized 3D via back-projection and the refined z-root.
Reference: src/models/rn_25D_wMLPref.py:75-134 (released .pth weights define
checkpoint parity — see models/port.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from peclr_tpu.models.heads import ZrootRefineMLP
from peclr_tpu.models.resnet import ResNetEncoder

#: FreiHAND default intrinsics for 224x224 crops (reference
#: rn_25D_wMLPref.py:94-104)
K_DEFAULT = jnp.array(
    [
        [388.9018310596544, 0.0, 112.0],
        [0.0, 388.71231836584275, 112.0],
        [0.0, 0.0, 1.0],
    ],
    dtype=jnp.float32,
)


class RN25DPose(nn.Module):
    """Returns dict(kp3d, zrel, kp2d, kp25d).

    kp25d: (B, 21, 3) raw 2.5D prediction (pixel u, v, relative depth).
    kp3d:  (B, 21, 3) scale-normalized 3D = unnormalized rays * (zrel+zroot).
    """

    size: str = "50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, K: Optional[jnp.ndarray] = None, train: bool = False):
        batch = images.shape[0]
        if K is None:
            K = jnp.broadcast_to(K_DEFAULT, (batch, 3, 3))
        z = ResNetEncoder(size=self.size, dtype=self.dtype, name="backbone")(
            images, train=train
        )
        out = nn.Dense(21 * 3 + 1, param_dtype=jnp.float32, name="fc")(z)
        kp25d = out[:, :-1].reshape(batch, 21, 3)
        # root-relative depth of the wrist is 0 by definition (the torch
        # reference writes through a view, so its kp25d is zeroed too)
        kp25d = kp25d.at[:, 0, 2].set(0.0)
        kp2d = kp25d[..., :2]
        zrel = kp25d[..., 2:3]
        kp2d_h = jnp.concatenate([kp2d, jnp.ones((batch, 21, 1), kp2d.dtype)], axis=2)
        K_inv = jnp.linalg.inv(K)
        kp3d_unnorm = jnp.einsum("bnj,bij->bni", kp2d_h, K_inv)
        zroot = ZrootRefineMLP(name="zroot_ref")(kp3d_unnorm, zrel, train=train)
        kp3d = kp3d_unnorm * (zrel + zroot[:, None, None])
        return {"kp3d": kp3d, "zrel": zrel, "kp2d": kp2d, "kp25d": kp25d}
