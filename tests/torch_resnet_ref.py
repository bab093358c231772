"""Test-only torch reference: run a torchvision-layout ResNet state dict
forward with torch.nn.functional ops.

torchvision itself is not installed in this image; this minimal functional
interpreter executes the canonical ResNet topology straight from a state
dict, giving an independent numerical oracle for the flax implementation
and the checkpoint port (models/port.py).
"""

import torch
import torch.nn.functional as F

from peclr_tpu.models.resnet import RESNET_SPECS


def _bn(x, sd, prefix):
    return F.batch_norm(
        x,
        sd[f"{prefix}.running_mean"],
        sd[f"{prefix}.running_var"],
        sd[f"{prefix}.weight"],
        sd[f"{prefix}.bias"],
        training=False,
        eps=1e-5,
    )


def _basic_block(x, sd, prefix, stride, has_down):
    identity = x
    out = F.conv2d(x, sd[f"{prefix}.conv1.weight"], stride=stride, padding=1)
    out = F.relu(_bn(out, sd, f"{prefix}.bn1"))
    out = F.conv2d(out, sd[f"{prefix}.conv2.weight"], stride=1, padding=1)
    out = _bn(out, sd, f"{prefix}.bn2")
    if has_down:
        identity = F.conv2d(x, sd[f"{prefix}.downsample.0.weight"], stride=stride)
        identity = _bn(identity, sd, f"{prefix}.downsample.1")
    return F.relu(out + identity)


def _bottleneck_block(x, sd, prefix, stride, has_down):
    identity = x
    out = F.conv2d(x, sd[f"{prefix}.conv1.weight"])
    out = F.relu(_bn(out, sd, f"{prefix}.bn1"))
    out = F.conv2d(out, sd[f"{prefix}.conv2.weight"], stride=stride, padding=1)
    out = F.relu(_bn(out, sd, f"{prefix}.bn2"))
    out = F.conv2d(out, sd[f"{prefix}.conv3.weight"])
    out = _bn(out, sd, f"{prefix}.bn3")
    if has_down:
        identity = F.conv2d(x, sd[f"{prefix}.downsample.0.weight"], stride=stride)
        identity = _bn(identity, sd, f"{prefix}.downsample.1")
    return F.relu(out + identity)


@torch.no_grad()
def torch_resnet_forward(state_dict, size, images_nchw, fc: bool = False):
    """Eval-mode forward.  images_nchw: torch (B, 3, H, W) float32.
    Returns the pooled embedding (B, E) or fc output if `fc`."""
    sd = {k: torch.as_tensor(v) for k, v in state_dict.items()}
    block_kind, stages = RESNET_SPECS[size]
    run_block = _basic_block if block_kind == "basic" else _bottleneck_block

    x = F.conv2d(images_nchw, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(_bn(x, sd, "bn1"))
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)
    for stage_idx, num_blocks in enumerate(stages):
        for j in range(num_blocks):
            stride = 2 if (stage_idx > 0 and j == 0) else 1
            has_down = j == 0 and (stage_idx > 0 or block_kind == "bottleneck")
            x = run_block(x, sd, f"layer{stage_idx + 1}.{j}", stride, has_down)
    x = x.mean(dim=(2, 3))
    if fc:
        x = F.linear(x, sd["fc.weight"], sd["fc.bias"])
    return x
