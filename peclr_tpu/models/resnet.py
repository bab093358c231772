"""ResNet-18/34/50/101/152 encoder family in Flax (NHWC, TPU-native).

The module tree is named so every parameter corresponds 1:1 to a torchvision
ResNet state-dict entry (conv1, bn1, layer{1..4}.{i}.conv{j}/bn{j}/downsample)
— checkpoint-level interop with the released PeCLR `.pth` weights is a parity
requirement (reference: src/models/resnet_model.py:6-55, which repackages
torchvision resnets; port tool src/models/port_model.py:7-48).

TPU notes:
  * NHWC + channels-last convolutions map directly onto XLA's TPU conv
    tiling; weights are stored HWIO (the port tool transposes torch OIHW).
  * Compute dtype is configurable (bf16 by default in training) while params
    and batch-norm statistics stay f32.
  * Inference-mode batch-norm folds into a scale+shift that XLA fuses into
    the preceding conv.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

#: stage template per resnet size: (block, blocks-per-stage)
RESNET_SPECS = {
    "18": ("basic", (2, 2, 2, 2)),
    "34": ("basic", (3, 4, 6, 3)),
    "50": ("bottleneck", (3, 4, 6, 3)),
    "101": ("bottleneck", (3, 4, 23, 3)),
    "152": ("bottleneck", (3, 8, 36, 3)),
}

#: pooled embedding width per size
EMBED_DIM = {"18": 512, "34": 512, "50": 2048, "101": 2048, "152": 2048}


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch semantics: eps=1e-5, momentum 0.1 on running
    stats, affine scale/bias.  Stats are kept in the 'batch_stats'
    collection in f32."""

    use_running_average: bool = True
    momentum: float = 0.9  # flax convention: new = m*old + (1-m)*batch
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
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


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    norm: ModuleDef = TorchBatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.features, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        out = self.norm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.features, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = self.norm(dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = conv(
                self.features, 1, self.stride, name="downsample_conv", dtype=self.dtype
            )(x)
            identity = self.norm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    norm: ModuleDef = TorchBatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.features, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = self.norm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        # torchvision puts the stride on the 3x3 conv
        out = conv(self.features, 3, self.stride, name="conv2", dtype=self.dtype)(out)
        out = self.norm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.features * 4, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = self.norm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = conv(
                self.features * 4, 1, self.stride,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            identity = self.norm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Backbone producing the pooled embedding (…, EMBED_DIM[size]).

    `train=True` uses batch statistics (and updates the 'batch_stats'
    collection); `train=False` uses running averages.
    """

    size: str = "50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stages = RESNET_SPECS[self.size]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        norm = partial(TorchBatchNorm, use_running_average=not train)
        block = partial(block_cls, norm=norm, dtype=self.dtype)

        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = norm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        expansion = 1 if block_kind == "basic" else 4
        in_features = 64
        for stage_idx, num_blocks in enumerate(stages):
            features = 64 * (2**stage_idx)
            for block_idx in range(num_blocks):
                stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
                needs_down = block_idx == 0 and (
                    stride != 1 or in_features != features * expansion
                )
                x = block(
                    features=features,
                    stride=stride,
                    downsample=needs_down,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x)
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
