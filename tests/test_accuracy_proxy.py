"""Regression assertion on the committed accuracy-proxy artifact.

scripts/accuracy_proxy.py pretrains PeCLR vs SimCLR with identical
seeds/data/augmentations on synthetic hand frames and linear-probes the
frozen encoders for 2D keypoints.  The committed JSONL records the runs; the
PeCLR (equivariant) probe must beat the SimCLR (invariant) one — the only
locally-runnable evidence that the equivariance semantics help, not just
compile (VERDICT r1 item 7; the claim itself: hybrid2_model.py:27-90)."""

import json
import os

import pytest

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "fixtures", "accuracy_proxy.jsonl"
)


def _records():
    if not os.path.exists(ARTIFACT):
        pytest.fail("accuracy_proxy.jsonl artifact missing — run "
                    "scripts/accuracy_proxy.py")
    with open(ARTIFACT) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_artifact_schema():
    for r in _records():
        assert {"config", "peclr", "simclr",
                "epe_ratio_peclr_over_simclr"} <= set(r)
        assert r["peclr"]["probe_epe_px"] > 0
        assert r["simclr"]["probe_epe_px"] > 0


def test_equivariant_beats_invariant():
    rs = _records()
    # The claim belongs to the 64px probe regime, where the synthetic task
    # is hard enough for the linear probe to order the objectives.  The
    # JSONL also records recipe-shape (128px, LARS) runs, where both
    # objectives keep absolute pose linearly decodable and land within
    # probe noise of each other — those are asserted by
    # tests/test_accuracy_curves.py instead.  Within the 64px regime the
    # primary (largest-steps) run carries the claim: the PeCLR probe must
    # beat the SimCLR one by at least a 3% margin.  Shorter runs are
    # informational — a noisy smoke record must not fail the suite.
    regime = [r for r in rs if r["config"]["view"] == 64]
    assert regime, "no 64px probe-regime records committed"
    primary = max(regime, key=lambda r: r["config"]["steps"])
    assert primary["epe_ratio_peclr_over_simclr"] < 0.97, primary


def test_equivariant_wins_at_every_capacity_in_decisive_regime():
    """The 64px regime spans all three backbone capacities at 3 seeds
    each for the published sizes (round-5 on-chip runs): PeCLR's probe
    beats SimCLR's on EVERY committed non-smoke record — RN18 0.90-0.99
    (seeds 5/6), RN50 0.79/0.883/0.885/0.898 (seed 5 at 600+360 steps,
    seeds 6/7), RN152 0.971/0.950/0.896 (seeds 5/6/7).  This localizes
    the RN152 recipe-shape inversion
    (test_accuracy_curves.py::test_recipe_shape_ordering_multiseed_rn152)
    to that regime's saturated probes, not to encoder capacity per se."""
    rs = [r for r in _records()
          if r["config"]["view"] == 64 and r["config"]["steps"] >= 300]
    sizes = {r["config"]["resnet"] for r in rs}
    assert {"18", "50", "152"} <= sizes, sizes
    for r in rs:
        assert r["epe_ratio_peclr_over_simclr"] < 1.0, r["config"]
