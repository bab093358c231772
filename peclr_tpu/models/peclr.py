"""PeCLR / SimCLR pretraining model: ResNet encoder + projection MLP.

The equivariant projection-space transforms and the NT-Xent loss are
functional (losses/), keeping the module a pure feature extractor; the
training step composes them under one jit.  Reference:
src/models/unsupervised/simclr_model.py (encoder+head wiring, forward
returning {embedding, projection}) and hybrid2_model.py (PeCLR semantics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from peclr_tpu.models.heads import ProjectionHead
from peclr_tpu.models.resnet import EMBED_DIM, ResNetEncoder


class PeCLRModel(nn.Module):
    """Encoder + projection head.

    `__call__(images)` -> dict(embedding (B, E), projection (B, D)).
    Both contrastive views are expected concatenated along the batch axis
    (one big MXU-friendly encoder pass, matching the reference's
    torch.cat of the two views — hybrid2_model.py:30-38).
    """

    resnet_size: str = "50"
    projection_hidden_dim: int = 512
    projection_dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        embedding = ResNetEncoder(
            size=self.resnet_size, dtype=self.dtype, name="encoder"
        )(images, train=train)
        projection = ProjectionHead(
            hidden_dim=self.projection_hidden_dim,
            output_dim=self.projection_dim,
            dtype=self.dtype,
            name="projection_head",
        )(embedding, train=train)
        return {"embedding": embedding, "projection": projection}

    @property
    def embed_dim(self) -> int:
        return EMBED_DIM[self.resnet_size]
