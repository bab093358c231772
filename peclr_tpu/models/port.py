"""Bidirectional checkpoint port: torch(vision) state dicts <-> flax variables.

Covers every checkpoint flavor the reference ecosystem produces/consumes
(reference: src/models/port_model.py:7-48 `peclr_to_torchvision`,
src/models/utils.py:209-225 `get_encoder_state_dict`, README.md:59-122):

  * plain torchvision ResNet state dicts        <-> ResNetEncoder(+fc)
  * PeCLR lightning checkpoints ("encoder.features.N.*" Sequential naming,
    "projection_head.{0,1,3}.*")                <-> PeCLRModel
  * released RN_25D_wMLPref .pth weights
    ("backend_model.*", "zroot_ref.zroot_ref.{0,1,3,4,6}.*") <-> RN25DPose

Conventions handled: conv OIHW -> HWIO transpose, linear (out,in) -> (in,out)
transpose, BN weight/bias/running_mean/running_var -> scale/bias/mean/var,
num_batches_tracked dropped on import and synthesized on export.

Values may be numpy arrays or torch tensors (torch is an optional import
used only at the host boundary; no torch in any compute path).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from peclr_tpu.models.resnet import RESNET_SPECS

# kinds: 'conv' (OIHW<->HWIO), 'dense_w' ((out,in)<->(in,out)),
# 'copy' (1-D params), each entry: (torch_name, collection, flax_path, kind)
Entry = Tuple[str, str, Tuple[str, ...], str]

_BN_FIELDS = (
    ("weight", "params", "scale", "copy"),
    ("bias", "params", "bias", "copy"),
    ("running_mean", "batch_stats", "mean", "copy"),
    ("running_var", "batch_stats", "var", "copy"),
)


def _bn_entries(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[Entry]:
    return [
        (f"{torch_prefix}.{tf}", coll, flax_path + (ff,), kind)
        for tf, coll, ff, kind in _BN_FIELDS
    ]


def resnet_mapping(size: str, fc_out: int | None = None) -> List[Entry]:
    """Name table for a torchvision-style ResNet of the given size.

    With `fc_out` set, includes the final fc layer (pose models); otherwise
    maps the encoder only (pretraining mode strips fc).
    """
    block_kind, stages = RESNET_SPECS[size]
    convs_per_block = 2 if block_kind == "basic" else 3
    entries: List[Entry] = [("conv1.weight", "params", ("conv1", "kernel"), "conv")]
    entries += _bn_entries("bn1", ("bn1",))
    for stage_idx, num_blocks in enumerate(stages):
        for j in range(num_blocks):
            t_blk = f"layer{stage_idx + 1}.{j}"
            f_blk = f"layer{stage_idx + 1}_{j}"
            for k in range(1, convs_per_block + 1):
                entries.append(
                    (f"{t_blk}.conv{k}.weight", "params",
                     (f_blk, f"conv{k}", "kernel"), "conv")
                )
                entries += _bn_entries(f"{t_blk}.bn{k}", (f_blk, f"bn{k}"))
            # first block of a stage has a projection shortcut (stage 1 only
            # for bottleneck, where channel count changes at stride 1)
            has_down = j == 0 and (stage_idx > 0 or block_kind == "bottleneck")
            if has_down:
                entries.append(
                    (f"{t_blk}.downsample.0.weight", "params",
                     (f_blk, "downsample_conv", "kernel"), "conv")
                )
                entries += _bn_entries(
                    f"{t_blk}.downsample.1", (f_blk, "downsample_bn")
                )
    if fc_out is not None:
        entries.append(("fc.weight", "params", ("fc", "kernel"), "dense_w"))
        entries.append(("fc.bias", "params", ("fc", "bias"), "copy"))
    return entries


def projection_head_mapping() -> List[Entry]:
    """Torch Sequential(Linear, BatchNorm1d, ReLU, Linear-no-bias) ->
    ProjectionHead{lin1, bn, lin2}."""
    return [
        ("0.weight", "params", ("lin1", "kernel"), "dense_w"),
        ("0.bias", "params", ("lin1", "bias"), "copy"),
        *_bn_entries("1", ("bn",)),
        ("3.weight", "params", ("lin2", "kernel"), "dense_w"),
    ]


def zroot_mlp_mapping() -> List[Entry]:
    """Torch Sequential(Linear, BN, LeakyReLU, Linear, BN, LeakyReLU, Linear)
    -> ZrootRefineMLP{lin1, bn1, lin2, bn2, lin3}."""
    return [
        ("0.weight", "params", ("lin1", "kernel"), "dense_w"),
        ("0.bias", "params", ("lin1", "bias"), "copy"),
        *_bn_entries("1", ("bn1",)),
        ("3.weight", "params", ("lin2", "kernel"), "dense_w"),
        ("3.bias", "params", ("lin2", "bias"), "copy"),
        *_bn_entries("4", ("bn2",)),
        ("6.weight", "params", ("lin3", "kernel"), "dense_w"),
        ("6.bias", "params", ("lin3", "bias"), "copy"),
    ]


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _import_value(v: np.ndarray, kind: str) -> np.ndarray:
    v = _to_numpy(v).astype(np.float32)
    if kind == "conv":
        return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    if kind == "dense_w":
        return np.transpose(v, (1, 0))  # (out,in) -> (in,out)
    return v


def _export_value(v: np.ndarray, kind: str) -> np.ndarray:
    v = _to_numpy(v).astype(np.float32)
    if kind == "conv":
        return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
    if kind == "dense_w":
        return np.transpose(v, (1, 0))
    return v


def import_state_dict(
    state_dict: Dict[str, np.ndarray],
    mapping: List[Entry],
    torch_prefix: str = "",
    flax_prefix: Tuple[str, ...] = (),
    strict: bool = True,
) -> Dict[str, dict]:
    """Build flax variables {'params':…, 'batch_stats':…} from a torch
    state dict according to `mapping`."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for torch_name, coll, flax_path, kind in mapping:
        key = torch_prefix + torch_name
        if key not in state_dict:
            if strict:
                raise KeyError(f"missing checkpoint key: {key}")
            continue
        flat[(coll,) + flax_prefix + flax_path] = _import_value(
            state_dict[key], kind
        )
    return unflatten_dict(flat)


def export_state_dict(
    variables: Dict[str, dict],
    mapping: List[Entry],
    torch_prefix: str = "",
    flax_prefix: Tuple[str, ...] = (),
    with_num_batches_tracked: bool = True,
) -> Dict[str, np.ndarray]:
    """Inverse of import_state_dict: flax variables -> torch-layout dict."""
    flat = flatten_dict(variables)
    out: Dict[str, np.ndarray] = {}
    for torch_name, coll, flax_path, kind in mapping:
        full = (coll,) + flax_prefix + flax_path
        if full not in flat:
            raise KeyError(f"missing flax param: {'/'.join(full)}")
        out[torch_prefix + torch_name] = _export_value(flat[full], kind)
        if with_num_batches_tracked and torch_name.endswith("running_var"):
            out[
                torch_prefix + torch_name.replace("running_var", "num_batches_tracked")
            ] = np.zeros((), np.int64)
    return out


# ---------------------------------------------------------------------------
# Checkpoint-flavor front doors
# ---------------------------------------------------------------------------

#: reference ResNetModel packs the backbone into nn.Sequential "features":
#: 0=conv1 1=bn1 2=relu 3=maxpool 4..7=layer1..4 8=avgpool
#: (src/models/resnet_model.py:16-26)
_FEATURES_INDEX = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                   "layer3": "6", "layer4": "7"}


def _features_name(torch_name: str) -> str:
    """torchvision name -> reference 'features.N.*' Sequential name."""
    head, rest = torch_name.split(".", 1)
    if head in ("conv1", "bn1"):
        return f"features.{_FEATURES_INDEX[head]}.{rest}"
    # layerX.j.rest -> features.N.j.rest
    return f"features.{_FEATURES_INDEX[head]}.{rest}"


def torchvision_to_encoder(state_dict, size: str, prefix: str = ""):
    """torchvision resnet state dict -> ResNetEncoder variables."""
    return import_state_dict(state_dict, resnet_mapping(size), torch_prefix=prefix)


def encoder_to_torchvision(variables, size: str):
    return export_state_dict(variables, resnet_mapping(size))


def peclr_checkpoint_to_variables(state_dict, size: str):
    """Reference PeCLR lightning checkpoint -> PeCLRModel variables.

    Accepts the 'state_dict' payload with keys like
    'encoder.features.0.weight' and 'projection_head.0.weight'.
    """
    enc_mapping = [
        ("encoder." + _features_name(tn), coll, ("encoder",) + fp, kind)
        for tn, coll, fp, kind in resnet_mapping(size)
    ]
    head_mapping = [
        ("projection_head." + tn, coll, ("projection_head",) + fp, kind)
        for tn, coll, fp, kind in projection_head_mapping()
    ]
    return import_state_dict(state_dict, enc_mapping + head_mapping)


def variables_to_peclr_checkpoint(variables, size: str):
    """PeCLRModel variables -> reference-layout state dict (for consumers of
    the reference's checkpoints, e.g. its own port_model.py)."""
    enc_mapping = [
        ("encoder." + _features_name(tn), coll, ("encoder",) + fp, kind)
        for tn, coll, fp, kind in resnet_mapping(size)
    ]
    head_mapping = [
        ("projection_head." + tn, coll, ("projection_head",) + fp, kind)
        for tn, coll, fp, kind in projection_head_mapping()
    ]
    return export_state_dict(variables, enc_mapping + head_mapping)


def peclr_to_torchvision(variables, size: str):
    """Export just the encoder of a PeCLRModel as a torchvision state dict
    (without fc) — the equivalent of the reference port tool
    (src/models/port_model.py:7-48)."""
    mapping = [
        (tn, coll, ("encoder",) + fp, kind)
        for tn, coll, fp, kind in resnet_mapping(size)
    ]
    return export_state_dict(variables, mapping)


def torchvision_to_peclr_encoder(state_dict, size: str, prefix: str = ""):
    """Load torchvision weights into the encoder subtree of a PeCLRModel
    (e.g. ImageNet init)."""
    mapping = [
        (tn, coll, ("encoder",) + fp, kind)
        for tn, coll, fp, kind in resnet_mapping(size)
    ]
    return import_state_dict(state_dict, mapping, torch_prefix=prefix)


def rn25d_checkpoint_to_variables(state_dict, size: str):
    """Released RN_25D_wMLPref .pth -> RN25DPose variables.

    Torch layout: backend_model.{conv1,bn1,layer*,fc}, zroot_ref.zroot_ref.N
    (reference rn_25D_wMLPref.py:75-104).
    """
    backbone = [
        ("backend_model." + tn, coll, ("backbone",) + fp, kind)
        for tn, coll, fp, kind in resnet_mapping(size)
    ]
    fc = [
        ("backend_model.fc.weight", "params", ("fc", "kernel"), "dense_w"),
        ("backend_model.fc.bias", "params", ("fc", "bias"), "copy"),
    ]
    zroot = [
        ("zroot_ref.zroot_ref." + tn, coll, ("zroot_ref",) + fp, kind)
        for tn, coll, fp, kind in zroot_mlp_mapping()
    ]
    return import_state_dict(state_dict, backbone + fc + zroot)


def variables_to_rn25d_checkpoint(variables, size: str):
    backbone = [
        ("backend_model." + tn, coll, ("backbone",) + fp, kind)
        for tn, coll, fp, kind in resnet_mapping(size)
    ]
    fc = [
        ("backend_model.fc.weight", "params", ("fc", "kernel"), "dense_w"),
        ("backend_model.fc.bias", "params", ("fc", "bias"), "copy"),
    ]
    zroot = [
        ("zroot_ref.zroot_ref." + tn, coll, ("zroot_ref",) + fp, kind)
        for tn, coll, fp, kind in zroot_mlp_mapping()
    ]
    return export_state_dict(variables, backbone + fc + zroot)
