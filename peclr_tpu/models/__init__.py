"""Model zoo: ResNet encoder family, PeCLR pretraining model, 2.5D pose
model, and torch checkpoint interop."""

from peclr_tpu.models.resnet import (  # noqa: F401
    EMBED_DIM,
    RESNET_SPECS,
    ResNetEncoder,
    ResNetPose,
)
from peclr_tpu.models.heads import ProjectionHead, ZrootRefineMLP  # noqa: F401
from peclr_tpu.models.peclr import PeCLRModel  # noqa: F401
from peclr_tpu.models.rn25d import RN25DPose, K_DEFAULT  # noqa: F401
