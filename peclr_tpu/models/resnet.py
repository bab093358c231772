"""ResNet-18/34/50/101/152 encoder family in Flax (NHWC, TPU-native).

The module tree is named so every parameter corresponds 1:1 to a torchvision
ResNet state-dict entry (conv1, bn1, layer{i}_{j} blocks with
conv/bn/downsample) — checkpoint-level interop with the released PeCLR
`.pth` weights is a parity requirement (reference: src/models/resnet_model.py
repackages torchvision resnets; port tool src/models/port_model.py:7-48).
See models/port.py for the name mapping.

TPU notes:
  * NHWC + channels-last convolutions map directly onto XLA's TPU conv
    tiling; weights are stored HWIO (the port tool transposes torch OIHW).
  * Compute dtype is configurable (bf16 by default in training) while params
    and batch-norm statistics stay f32.
  * Inference-mode batch-norm folds into a scale+shift that XLA fuses into
    the preceding conv.
"""

from __future__ import annotations

import os

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from peclr_tpu.ops.pooling import max_pool_3x3s2p1

ModuleDef = Any

#: stage template per resnet size: (block kind, blocks-per-stage)
RESNET_SPECS = {
    "18": ("basic", (2, 2, 2, 2)),
    "34": ("basic", (3, 4, 6, 3)),
    "50": ("bottleneck", (3, 4, 6, 3)),
    "101": ("bottleneck", (3, 4, 23, 3)),
    "152": ("bottleneck", (3, 8, 36, 3)),
}

#: pooled embedding width per size
EMBED_DIM = {"18": 512, "34": 512, "50": 2048, "101": 2048, "152": 2048}


def _conv(features, kernel, stride, name, dtype):
    """Bias-free conv with torch-style symmetric padding (kernel//2)."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def remat_mode() -> str:
    """Selective-rematerialization mode for the residual blocks (PECLR_REMAT).

    The fwd->bwd boundary of a BatchNorm block saves tiny f32[C] mean/var
    vectors per layer; on the v5e recipe the r4 trace bills the resulting
    VMEM<->HBM eviction swarm at ~19 ms/step (RN50, 53 BN layers) / ~79 ms
    (RN152, 151) of unhidden DMA latency (BENCHLOG round 4).  Remat modes
    trade those saves for recompute:

      ""      — no remat (autodiff saves what it needs).  Default.
      "bn"    — each residual block saves ONLY its conv outputs (tagged
                'conv_out' below) + the block input; BN stat reduces,
                normalizes and relus are recomputed in the backward pass,
                so no f32[C] statistics cross the boundary.
      "block" — full-block remat (nothing saved but the block input);
                convs recompute too.  Expected FLOP-bound loss; kept for
                the A/B record.
    """
    return os.environ.get("PECLR_REMAT", "")


def maybe_remat(block_cls):
    """Wrap a block class in lifted remat per remat_mode().

    prevent_cse=False: the blocks run inside the grad-accumulation lax.scan
    (train/step.py), where XLA's CSE cannot defeat remat and the barrier
    would only block fusion.  static_argnums=(2,) marks `train` static
    (flax counts the bound module as argument 0).
    """
    mode = remat_mode()
    if not mode:
        return block_cls
    if mode == "bn":
        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
    elif mode == "block":
        policy = jax.checkpoint_policies.nothing_saveable
    else:
        raise ValueError(f"PECLR_REMAT={mode!r} (want '', 'bn' or 'block')")
    return nn.remat(
        block_cls, prevent_cse=False, policy=policy, static_argnums=(2,)
    )


#: Every BatchNorm in the package shares this flax momentum (torch 0.1).
#: train/step.py's stats_accum="outside" replays the running-stat momentum
#: chain in closed form with this value — keep them coupled via this name.
BN_MOMENTUM = 0.9


def _bn(train, name, dtype):
    """BatchNorm with torch semantics: eps=1e-5, running-stat momentum 0.1
    (flax momentum 0.9), f32 params/stats."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class StemConv(nn.Module):
    """The 7x7/2 stem conv computed via 2x2 space-to-depth.

    A direct 7x7 conv on 3 channels wastes the MXU (3 of 128 contraction
    lanes).  Reshaping the input to (H/2, W/2, 12) and the kernel to
    (4, 4, 12, 64) is EXACTLY the same linear map (the kernel is zero-padded
    7->8 taps and regrouped), but contracts over 4*4*12=192 elements — the
    classic TPU ResNet stem optimization.  The stored parameter keeps the
    canonical torchvision shape (7, 7, 3, 64) so checkpoint ports are
    unaffected; the repack happens in-graph (tiny, fused away).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (7, 7, 3, 64),
            jnp.float32,
        ).astype(self.dtype)
        b, h, w, c = x.shape
        # input space-to-depth: (B, H/2, W/2, (py, px, ch))
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # kernel: pad taps 7->8 so tap index t = dy+4 = 2r+py, then regroup
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k2 = k8.reshape(4, 2, 4, 2, 3, 64)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)
        return jax.lax.conv_general_dilated(
            x2,
            k2,
            window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 3, self.stride, "conv1", self.dtype)(x)
        out = checkpoint_name(out, "conv_out")
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2", self.dtype)(out)
        out = checkpoint_name(out, "conv_out")
        out = _bn(train, "bn2", self.dtype)(out)
        if self.downsample:
            identity = _conv(
                self.features, 1, self.stride, "downsample_conv", self.dtype
            )(x)
            identity = checkpoint_name(identity, "conv_out")
            identity = _bn(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; block output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 1, 1, "conv1", self.dtype)(x)
        out = checkpoint_name(out, "conv_out")
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        # torchvision places the stride on the 3x3 conv
        out = _conv(self.features, 3, self.stride, "conv2", self.dtype)(out)
        out = checkpoint_name(out, "conv_out")
        out = _bn(train, "bn2", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, "conv3", self.dtype)(out)
        out = checkpoint_name(out, "conv_out")
        out = _bn(train, "bn3", self.dtype)(out)
        if self.downsample:
            identity = _conv(
                self.features * 4, 1, self.stride, "downsample_conv", self.dtype
            )(x)
            identity = checkpoint_name(identity, "conv_out")
            identity = _bn(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Backbone producing the pooled embedding (…, EMBED_DIM[size]).

    `train=True` uses batch statistics and updates the 'batch_stats'
    collection; `train=False` uses running averages (torch eval mode).
    """

    size: str = "50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stages = RESNET_SPECS[self.size]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        block_cls = maybe_remat(block_cls)
        expansion = 1 if block_kind == "basic" else 4

        x = x.astype(self.dtype)
        x = StemConv(dtype=self.dtype, name="conv1")(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.relu(x)
        # stem pool with selectable backward (ops/pooling.py); the XLA
        # SelectAndScatter path won the v5e A/B and is the default
        x = max_pool_3x3s2p1(x)

        in_features = 64
        for stage_idx, num_blocks in enumerate(stages):
            features = 64 * (2**stage_idx)
            for block_idx in range(num_blocks):
                stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
                needs_down = block_idx == 0 and (
                    stride != 1 or in_features != features * expansion
                )
                x = block_cls(
                    features=features,
                    stride=stride,
                    downsample=needs_down,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
                in_features = features * expansion

        # global average pool == AdaptiveAvgPool2d((1,1))
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


class ResNetPose(nn.Module):
    """Encoder + final linear head emitting 21*3 keypoints + 1 scale logit
    (reference ResNetModel with mode != 'pretraining',
    src/models/resnet_model.py:45-55)."""

    size: str = "50"
    dtype: Any = jnp.float32
    num_outputs: int = 21 * 3 + 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        z = ResNetEncoder(size=self.size, dtype=self.dtype, name="encoder")(
            x, train=train
        )
        out = nn.Dense(self.num_outputs, param_dtype=jnp.float32, name="fc")(z)
        return out
