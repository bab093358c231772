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

from peclr_tpu.constants import COMET_KWARGS, STD_LOGGING_FORMAT


def get_console_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(STD_LOGGING_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class CometRemote:
    """Adapter from the ExperimentLogger surface onto a `comet_ml.Experiment`.

    The reference tracks every run remotely on Comet (constants.py:24-29,
    upload_comet_logs.py:103-142: params, tags, per-step/epoch metrics,
    augmented-image figures).  This adapter restores that remote path on an
    opt-in basis; the offline JSONL record remains the source of truth and is
    written regardless of remote availability.
    """

    def __init__(self, experiment_name: str, comet_module=None):
        if comet_module is None:  # pragma: no cover - exercised via fake
            import comet_ml as comet_module  # noqa: F811
        kwargs = {k: v for k, v in COMET_KWARGS.items() if v is not None}
        self._exp = comet_module.Experiment(**kwargs)
        self._exp.set_name(experiment_name)

    def log_parameters(self, params: Dict[str, Any]):
        self._exp.log_parameters(params)

    def add_tags(self, tags):
        self._exp.add_tags(list(tags))

    def log_metrics(self, metrics, step=None, epoch=None, context="train"):
        # Comet namespaces val metrics by prefix (the reference enters
        # experiment.validate() context; a prefix is the stateless version).
        if context != "train":
            metrics = {f"{context}_{k}": v for k, v in metrics.items()}
        self._exp.log_metrics(metrics, step=step, epoch=epoch)

    def log_figure(self, path: str, name: Optional[str] = None):
        self._exp.log_image(path, name=name)

    def end(self):
        self._exp.end()


def make_remote_tracker(experiment_name: str):
    """Build the remote tracking backend selected by ``PECLR_TRACKER``.

    ``PECLR_TRACKER=comet`` -> CometRemote (requires the comet_ml package and
    the reference's COMET_* env vars).  Unset/"none"/"offline" -> None.  A
    missing package or failed construction degrades to offline-only with a
    warning — tracking must never block training.
    """
    backend = os.environ.get("PECLR_TRACKER", "").strip().lower()
    if backend in ("", "none", "offline"):
        return None
    log = get_console_logger("peclr_tpu.tracking")
    if backend != "comet":
        log.warning(f"unknown PECLR_TRACKER={backend!r}; tracking offline only")
        return None
    try:
        return CometRemote(experiment_name)
    except Exception as e:
        log.warning(f"comet tracker unavailable ({e}); tracking offline only")
        return None


class ExperimentLogger:
    """File-backed experiment tracker (Comet-equivalent surface).

    Optionally mirrors to a remote backend (``remote=`` or PECLR_TRACKER env
    selection); every remote call is exception-guarded so a dead link cannot
    kill a run.
    """

    def __init__(
        self,
        meta_dir: str,
        experiment_name: str,
        experiment_key: Optional[str] = None,
        log_interval: str = "epoch",
        remote=None,
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
        self.remote = (
            remote if remote is not None else make_remote_tracker(experiment_name)
        )

    def _remote(self, method: str, *args, **kwargs):
        if self.remote is None:
            return
        try:
            getattr(self.remote, method)(*args, **kwargs)
        except Exception as e:  # remote tracking must never kill training
            get_console_logger("peclr_tpu.tracking").warning(
                f"remote {method} failed: {e}"
            )

    def _flush_meta(self):
        with open(os.path.join(self.dir, "experiment.json"), "w") as f:
            json.dump(self._meta, f, indent=2, default=str)

    def log_parameters(self, params: Dict[str, Any]):
        flat = _flatten(params)
        self._meta["params"].update(flat)
        self._flush_meta()
        self._remote("log_parameters", flat)

    def add_tags(self, tags):
        self._meta["tags"].extend(tags)
        self._flush_meta()
        self._remote("add_tags", tags)

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
        self._remote(
            "log_metrics", metrics, step=step, epoch=epoch, context=context
        )

    def log_figure(self, path: str, name: Optional[str] = None):
        """Record a saved figure (reference: comet log_image of the
        augmented-pair panels, upload_comet_logs.py:38-101)."""
        with open(os.path.join(self.dir, "figures.jsonl"), "a") as f:
            f.write(json.dumps({"t": time.time(), "path": path, "name": name}) + "\n")
        self._remote("log_figure", path, name=name)

    def close(self):
        """Idempotent; the logger transparently reopens on a later write."""
        if not self._metrics_f.closed:
            self._metrics_f.close()
        self._remote("end")
        self.remote = None


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
