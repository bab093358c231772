"""Released-checkpoint fixtures: the EXACT key sets (names, order, shapes)
of the checkpoints the reference ecosystem publishes, with deterministic
seeded values.

The real released weights cannot be downloaded in this environment (zero
egress) — see PARITY.md "released-weight diff" TODO.  These fixtures pin
everything that does not require the bytes themselves:

  * `peclr-rn50.pth`-style lightning checkpoints: ``encoder.features.N.*``
    Sequential naming (resnet_model.py:16-29), the vestigial
    ``encoder.final_layer.0.*`` head that pretraining checkpoints still
    carry, ``projection_head.{0,1,3}.*`` (simclr_model.py:20-35), BN
    ``num_batches_tracked`` everywhere torch emits it.
  * RN_25D_wMLPref `.pth`: ``backend_model.*`` (torchvision resnet + fc) and
    ``zroot_ref.zroot_ref.{0,1,3,4,6}.*`` (rn_25D_wMLPref.py:17-27,75-104).
    The ``K_default``/``eps`` buffers are registered persistent=False and so
    are absent from the state dict.
  * plain torchvision layout (the output of the reference port tool,
    port_model.py:7-48 — positional zip, so ORDER is part of the contract).

Key order follows torch's module-definition order: within a BN,
(weight, bias, running_mean, running_var, num_batches_tracked); within a
block, conv1, bn1, …, downsample.0, downsample.1; fc last.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np

from peclr_tpu.models.resnet import RESNET_SPECS

Manifest = List[Tuple[str, Tuple[int, ...]]]

_BN1 = ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")


def _bn(prefix: str, n: int) -> Manifest:
    return [(f"{prefix}.{f}", () if f == "num_batches_tracked" else (n,)) for f in _BN1]


def torchvision_resnet_manifest(size: str = "50", fc_out: int | None = None) -> Manifest:
    """Key/shape list of torchvision ``resnet{size}().state_dict()``."""
    block_kind, stages = RESNET_SPECS[size]
    bottleneck = block_kind == "bottleneck"
    expansion = 4 if bottleneck else 1
    out: Manifest = [("conv1.weight", (64, 3, 7, 7))]
    out += _bn("bn1", 64)
    in_ch = 64
    for stage_idx, num_blocks in enumerate(stages):
        width = 64 * (2 ** stage_idx)
        for j in range(num_blocks):
            p = f"layer{stage_idx + 1}.{j}"
            stride_stage = stage_idx > 0 and j == 0
            if bottleneck:
                out += [(f"{p}.conv1.weight", (width, in_ch, 1, 1))]
                out += _bn(f"{p}.bn1", width)
                out += [(f"{p}.conv2.weight", (width, width, 3, 3))]
                out += _bn(f"{p}.bn2", width)
                out += [(f"{p}.conv3.weight", (width * 4, width, 1, 1))]
                out += _bn(f"{p}.bn3", width * 4)
            else:
                out += [(f"{p}.conv1.weight", (width, in_ch, 3, 3))]
                out += _bn(f"{p}.bn1", width)
                out += [(f"{p}.conv2.weight", (width, width, 3, 3))]
                out += _bn(f"{p}.bn2", width)
            if j == 0 and (stride_stage or in_ch != width * expansion):
                out += [
                    (f"{p}.downsample.0.weight", (width * expansion, in_ch, 1, 1))
                ]
                out += _bn(f"{p}.downsample.1", width * expansion)
            in_ch = width * expansion
    if fc_out is not None:
        out += [("fc.weight", (fc_out, in_ch)), ("fc.bias", (fc_out,))]
    return out


def peclr_lightning_manifest(size: str = "50") -> Manifest:
    """Keys of a reference PeCLR pretraining checkpoint's state_dict."""
    feat_idx = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                "layer3": "6", "layer4": "7"}
    embed = 2048 if RESNET_SPECS[size][0] == "bottleneck" else 512
    out: Manifest = []
    for key, shape in torchvision_resnet_manifest(size):
        head, rest = key.split(".", 1)
        out.append((f"encoder.features.{feat_idx[head]}.{rest}", shape))
    # vestigial supervised head: ResNetModel always constructs final_layer
    # (resnet_model.py:27-29), so pretraining checkpoints carry it
    out += [
        (f"encoder.final_layer.0.weight", (64, embed)),
        (f"encoder.final_layer.0.bias", (64,)),
    ]
    out += [
        ("projection_head.0.weight", (512, embed)),
        ("projection_head.0.bias", (512,)),
    ]
    out += [(f"projection_head.1.{f}",
             () if f == "num_batches_tracked" else (512,)) for f in _BN1]
    out += [("projection_head.3.weight", (128, 512))]
    return out


def rn25d_manifest(size: str = "50") -> Manifest:
    """Keys of a released RN_25D_wMLPref `.pth` state_dict."""
    out: Manifest = [
        (f"backend_model.{k}", s)
        for k, s in torchvision_resnet_manifest(size, fc_out=64)
    ]
    z = "zroot_ref.zroot_ref"
    out += [(f"{z}.0.weight", (128, 64)), (f"{z}.0.bias", (128,))]
    out += _bn(f"{z}.1", 128)
    out += [(f"{z}.3.weight", (128, 128)), (f"{z}.3.bias", (128,))]
    out += _bn(f"{z}.4", 128)
    out += [(f"{z}.6.weight", (1, 128)), (f"{z}.6.bias", (1,))]
    return out


def make_state_dict(manifest: Manifest, seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic seeded values with torch-plausible statistics.

    Per-key independent PCG64 streams so the values are stable regardless of
    iteration order or numpy version (PCG64 output is spec-pinned).
    """
    out: Dict[str, np.ndarray] = {}
    for key, shape in manifest:
        rng = np.random.default_rng(
            [seed, int.from_bytes(hashlib.sha256(key.encode()).digest()[:4], "big")]
        )
        if key.endswith("num_batches_tracked"):
            out[key] = np.asarray(100, np.int64)
        elif key.endswith("running_var"):
            out[key] = (0.5 + rng.random(shape)).astype(np.float32)
        elif key.endswith("weight") and len(shape) == 1:
            # 1-D weights are batch-norm scales: near 1
            out[key] = (1.0 + 0.1 * rng.standard_normal(shape)).astype(np.float32)
        else:
            out[key] = (0.05 * rng.standard_normal(shape)).astype(np.float32)
    return out


def state_dict_digest(sd: Dict[str, np.ndarray]) -> str:
    """Order-sensitive SHA-256 over keys, dtypes, shapes and bytes."""
    h = hashlib.sha256()
    for k, v in sd.items():
        v = np.ascontiguousarray(v)
        h.update(k.encode())
        h.update(str(v.dtype).encode())
        h.update(str(v.shape).encode())
        h.update(v.tobytes())
    return h.hexdigest()
