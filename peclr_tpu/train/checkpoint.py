"""Checkpointing: orbax save/restore with top-k retention on the monitored
train loss, latest-checkpoint discovery, and torch-interop export.

Reference policy (SURVEY §5.4): PL ModelCheckpoint keeps `save_top_k`
checkpoints every `period` epochs monitored on `checkpoint_saving_loss`
(epoch-mean train loss), laid out as
$SAVED_MODELS_BASE_PATH/<experiment_key>/checkpoints/epoch=N.ckpt
(models/utils.py:189-206).  Here: orbax checkpoints at
<base>/<experiment_key>/checkpoints/<epoch N> with the same top-k/period
semantics, plus `export_torch_*` bridges through models/port.py.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Top-k (lowest monitored loss) + every-N-epochs checkpoint policy."""

    def __init__(
        self,
        directory: str,
        save_top_k: int = 3,
        period: int = 1,
        monitor: str = "checkpoint_saving_loss",
    ):
        self.directory = os.path.join(directory, "checkpoints")
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.period = period
        self.monitor = monitor
        self._scores: Dict[int, float] = {}
        self._load_index()

    # -- index -------------------------------------------------------------
    @property
    def _index_path(self):
        return os.path.join(self.directory, "index.json")

    def _load_index(self):
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._scores = {int(k): v for k, v in json.load(f).items()}

    def _save_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._scores, f)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch}")

    # -- save/restore ------------------------------------------------------
    def save(self, epoch: int, state, metrics: Dict[str, float]) -> bool:
        """Save if the period elapsed; retain only the best top-k."""
        if (epoch + 1) % self.period != 0:
            return False
        score = float(metrics.get(self.monitor, np.inf))
        ocp = _ocp()
        path = os.path.abspath(self._epoch_dir(epoch))
        if os.path.exists(path):
            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state)
        self._scores[epoch] = score
        # drop worst beyond top-k
        if self.save_top_k > 0:
            keep = sorted(self._scores, key=lambda e: self._scores[e])[
                : self.save_top_k
            ]
            for e in list(self._scores):
                if e not in keep:
                    del self._scores[e]
                    stale = self._epoch_dir(e)
                    if os.path.exists(stale):
                        shutil.rmtree(stale)
        self._save_index()
        return True

    def resolve_epoch(self, checkpoint: str) -> int:
        """Resolve a checkpoint *name* to an epoch number.

        Accepts the reference's PL-style names ('epoch=12.ckpt',
        models/utils.py:189-206), this repo's layout ('epoch_12') and bare
        numbers ('12').  Raises FileNotFoundError if that checkpoint does
        not exist on disk."""
        epoch = parse_checkpoint_name(checkpoint)
        if not os.path.exists(self._epoch_dir(epoch)):
            have = sorted(
                int(m.group(1))
                for d in os.listdir(self.directory)
                if (m := re.fullmatch(r"epoch_(\d+)", d))
            )
            raise FileNotFoundError(
                f"checkpoint {checkpoint!r} (epoch {epoch}) not found under "
                f"{self.directory}; available epochs: {have}"
            )
        return epoch

    def latest_epoch(self) -> Optional[int]:
        epochs = [
            int(m.group(1))
            for d in os.listdir(self.directory)
            if (m := re.fullmatch(r"epoch_(\d+)", d))
        ]
        return max(epochs) if epochs else None

    def restore(self, state_like, epoch: Optional[int] = None):
        """Restore into the structure of `state_like`; `epoch=None` loads the
        newest checkpoint.  Returns (state, epoch) or (None, None)."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            return None, None
        ocp = _ocp()
        path = os.path.abspath(self._epoch_dir(epoch))
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(path, state_like)
        return state, epoch


def parse_checkpoint_name(checkpoint: str) -> int:
    """'epoch=12.ckpt' | 'epoch_12' | '12' -> 12 (the reference slices
    int(name[6:-5]) out of PL names — models/utils.py:203)."""
    m = re.fullmatch(r"(?:epoch[=_])?(\d+)(?:\.ckpt)?", checkpoint.strip())
    if not m:
        raise ValueError(
            f"unrecognized checkpoint name {checkpoint!r} "
            "(expected 'epoch=N.ckpt', 'epoch_N' or 'N')"
        )
    return int(m.group(1))


def save_experiment_key(
    meta_dir: str, experiment_name: str, experiment_key: str,
    filename: str = "default.csv",
):
    """Append to the experiment-key CSV registry
    (reference experiments/utils.py:396-409)."""
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, filename), "a") as f:
        f.write(f"{experiment_name},{experiment_key}\n")


def export_torch_peclr(state, resnet_size: str, path: str):
    """Write a reference-layout PeCLR checkpoint (.npz with the torch key
    names; loadable into torch via numpy) — interop with consumers of the
    reference's checkpoints."""
    from peclr_tpu.models import port

    sd = port.variables_to_peclr_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, resnet_size
    )
    np.savez(path, **sd)


def export_torchvision(state, resnet_size: str, path: str):
    """Write the encoder as a torchvision-layout state dict (.npz) — the
    peclr_to_torchvision equivalent (port_model.py:7-48)."""
    from peclr_tpu.models import port

    sd = port.peclr_to_torchvision(
        {"params": state.params, "batch_stats": state.batch_stats}, resnet_size
    )
    np.savez(path, **sd)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth/.ckpt (via torch, host-side) or .npz into a flat
    numpy state dict."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in payload.items()}
