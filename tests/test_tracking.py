"""Remote experiment-tracking adapter (reference: Comet ML).

The reference tracks every run on Comet (src/constants.py:24-29,
src/models/callbacks/upload_comet_logs.py:103-142).  peclr_tpu is
offline-first (JSONL is always written) with an opt-in remote mirror
selected by PECLR_TRACKER=comet.  These tests exercise the adapter against
a fake comet_ml Experiment: env selection, call mirroring, context
prefixing, figure upload, end-on-close, and the guarantee that a broken
remote can never kill a run.
"""

import json
import os
import sys
import types

import pytest

from peclr_tpu.utils.logging import (
    CometRemote,
    ExperimentLogger,
    make_remote_tracker,
)


class FakeExperiment:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.calls = []

    def set_name(self, name):
        self.calls.append(("set_name", name))

    def log_parameters(self, params):
        self.calls.append(("log_parameters", dict(params)))

    def add_tags(self, tags):
        self.calls.append(("add_tags", list(tags)))

    def log_metrics(self, metrics, step=None, epoch=None):
        self.calls.append(("log_metrics", dict(metrics), step, epoch))

    def log_image(self, path, name=None):
        self.calls.append(("log_image", path, name))

    def end(self):
        self.calls.append(("end",))


def _fake_comet_module():
    mod = types.ModuleType("comet_ml")
    mod.Experiment = FakeExperiment
    return mod


def _names(exp):
    return [c[0] for c in exp.calls]


class TestCometRemote:
    def test_mirrors_full_surface(self, tmp_path):
        remote = CometRemote("exp-name", comet_module=_fake_comet_module())
        exp = remote._exp
        logger = ExperimentLogger(str(tmp_path), "exp-name", remote=remote)
        logger.log_parameters({"train": {"lr": 1e-4}})
        logger.add_tags(["pretraining"])
        logger.log_metrics({"loss": 1.5}, step=3, epoch=0)
        logger.log_metrics({"loss": 1.2}, epoch=0, context="val")
        logger.log_figure("/tmp/fig.png", name="pair_epoch0")
        logger.close()

        assert ("set_name", "exp-name") in exp.calls
        # params arrive flattened, exactly as the JSONL meta records them
        assert ("log_parameters", {"train.lr": 1e-4}) in exp.calls
        assert ("add_tags", ["pretraining"]) in exp.calls
        assert ("log_metrics", {"loss": 1.5}, 3, 0) in exp.calls
        # non-train contexts are prefixed (stateless version of comet's
        # experiment.validate() context)
        assert ("log_metrics", {"val_loss": 1.2}, None, 0) in exp.calls
        assert ("log_image", "/tmp/fig.png", "pair_epoch0") in exp.calls
        assert exp.calls[-1] == ("end",)

        # the offline record is written regardless of the remote
        meta = json.load(open(tmp_path / logger.experiment_key / "experiment.json"))
        assert meta["params"] == {"train.lr": 1e-4}
        figs = [
            json.loads(l)
            for l in open(tmp_path / logger.experiment_key / "figures.jsonl")
        ]
        assert figs[0]["path"] == "/tmp/fig.png"

    def test_constructor_filters_unset_credentials(self):
        remote = CometRemote("n", comet_module=_fake_comet_module())
        # COMET_* env vars are unset in CI: no None values may be passed
        assert all(v is not None for v in remote._exp.kwargs.values())

    def test_broken_remote_never_kills_the_run(self, tmp_path):
        class Exploding:
            def __getattr__(self, name):
                def boom(*a, **k):
                    raise ConnectionError("link down")

                return boom

        logger = ExperimentLogger(str(tmp_path), "exp", remote=Exploding())
        logger.log_parameters({"a": 1})
        logger.log_metrics({"loss": 1.0}, epoch=0)
        logger.log_figure("/tmp/x.png")
        logger.close()  # no raise: every remote call is guarded
        meta = json.load(open(tmp_path / logger.experiment_key / "experiment.json"))
        assert meta["params"] == {"a": 1}


class TestEnvSelection:
    def test_default_is_offline_only(self, tmp_path, monkeypatch):
        monkeypatch.delenv("PECLR_TRACKER", raising=False)
        assert make_remote_tracker("exp") is None
        assert ExperimentLogger(str(tmp_path), "exp").remote is None

    @pytest.mark.parametrize("value", ["none", "offline", ""])
    def test_explicit_offline_values(self, value, monkeypatch):
        monkeypatch.setenv("PECLR_TRACKER", value)
        assert make_remote_tracker("exp") is None

    def test_comet_selected_via_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PECLR_TRACKER", "comet")
        monkeypatch.setitem(sys.modules, "comet_ml", _fake_comet_module())
        logger = ExperimentLogger(str(tmp_path), "exp")
        assert isinstance(logger.remote, CometRemote)
        logger.log_metrics({"loss": 2.0}, epoch=1)
        assert ("log_metrics", {"loss": 2.0}, None, 1) in logger.remote._exp.calls
        logger.close()

    def test_missing_package_degrades_to_offline(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PECLR_TRACKER", "comet")
        monkeypatch.setitem(sys.modules, "comet_ml", None)  # forces ImportError
        logger = ExperimentLogger(str(tmp_path), "exp")
        assert logger.remote is None  # warned, offline-only, no raise
        logger.log_metrics({"loss": 1.0}, epoch=0)
        logger.close()

    def test_unknown_backend_degrades_to_offline(self, monkeypatch):
        monkeypatch.setenv("PECLR_TRACKER", "wandb")
        assert make_remote_tracker("exp") is None
