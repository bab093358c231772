"""Console logging + experiment tracking.

The reference logs to Comet ML (params, tags, per-step/epoch metrics,
augmented-image figures) — SURVEY §5.5.  Here tracking is pluggable and
offline-first: an ExperimentLogger writes params/metrics/tags as JSONL under
SAVED_META_INFO_PATH/<experiment_key>/ (consumable by any dashboard), with
the same step/epoch cadence switch the reference exposes via
`-log_interval`.
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid
from typing import Any, Dict, Optional

from peclr_tpu.constants import STD_LOGGING_FORMAT


def get_console_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(STD_LOGGING_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class ExperimentLogger:
    """File-backed experiment tracker (Comet-equivalent surface)."""

    def __init__(
        self,
        meta_dir: str,
        experiment_name: str,
        experiment_key: Optional[str] = None,
        log_interval: str = "epoch",
    ):
        self.experiment_name = experiment_name
        self.experiment_key = experiment_key or uuid.uuid4().hex
        self.log_interval = log_interval
        self.dir = os.path.join(meta_dir, self.experiment_key)
        os.makedirs(self.dir, exist_ok=True)
        self._metrics_f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._meta: Dict[str, Any] = {
            "experiment_name": experiment_name,
            "experiment_key": self.experiment_key,
            "created": time.time(),
            "tags": [],
            "params": {},
        }
        self._flush_meta()

    def _flush_meta(self):
        with open(os.path.join(self.dir, "experiment.json"), "w") as f:
            json.dump(self._meta, f, indent=2, default=str)

    def log_parameters(self, params: Dict[str, Any]):
        self._meta["params"].update(
            {k: v for k, v in _flatten(params).items()}
        )
        self._flush_meta()

    def add_tags(self, tags):
        self._meta["tags"].extend(tags)
        self._flush_meta()

    def log_metrics(
        self,
        metrics: Dict[str, float],
        step: Optional[int] = None,
        epoch: Optional[int] = None,
        context: str = "train",
    ):
        rec = {
            "t": time.time(),
            "context": context,
            "step": step,
            "epoch": epoch,
            **{k: _to_float(v) for k, v in metrics.items()},
        }
        if self._metrics_f.closed:  # reopened after close() (e.g. re-fit)
            self._metrics_f = open(
                os.path.join(self.dir, "metrics.jsonl"), "a"
            )
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()

    def close(self):
        """Idempotent; the logger transparently reopens on a later write."""
        if not self._metrics_f.closed:
            self._metrics_f.close()


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


#: augmentation-flag -> short experiment-name code
#: (reference experiments/utils.py:335-393)
NAME_CODES = {
    "color_drop": "CD",
    "color_jitter": "CJ",
    "crop": "C",
    "cut_out": "CO",
    "flip": "F",
    "gaussian_blur": "GB",
    "random_crop": "RC",
    "resize": "Re",
    "rotate": "Ro",
    "sobel_filter": "SF",
    "gaussian_noise": "GN",
}


def prepare_name(prefix: str, batch_size: int, active_flags) -> str:
    codes = "_".join(sorted(NAME_CODES[f] for f in active_flags if f in NAME_CODES))
    return f"{prefix}{batch_size}{codes}"
