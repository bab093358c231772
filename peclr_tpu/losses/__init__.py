"""Losses: NT-Xent contrastive, equivariant projection transforms, and
supervised 2.5D/3D keypoint losses."""

from peclr_tpu.losses.ntxent import ntxent_loss  # noqa: F401
from peclr_tpu.losses.equivariance import (  # noqa: F401
    rotate_projections,
    translate_projections,
    translate_projections_exact,
    peclr_projections,
)
from peclr_tpu.losses.supervised import (  # noqa: F401
    l1_loss_25d,
    loss_3d,
    epe_metrics,
)
