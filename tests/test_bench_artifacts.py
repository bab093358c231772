"""The committed round-2 trace evidence must keep supporting the claims in
BENCHLOG.md: device-busy time, HBM traffic, and the speed-of-light floor are
recomputed here from bench_artifacts/hlo_stats_r2.json.gz with the same
arithmetic as scripts/trace_buckets.py."""

import gzip
import json
import os

import pytest

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "..", "bench_artifacts", "hlo_stats_r2.json.gz"
)
STEPS = 6  # 2 warmup + 4 timed steps in the captured run
HBM_PEAK_GBPS = 820.0


@pytest.fixture(scope="module")
def ops():
    with gzip.open(ARTIFACT, "rt") as f:
        d = json.load(f)
    cols = [c["id"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}

    def val(row, col):
        v = row["c"][idx[col]]
        return v.get("v") if isinstance(v, dict) else v

    return [
        {
            "t_ms": float(val(r, "total_self_time") or 0.0) / 1e3 / STEPS,
            "bw": float(val(r, "measured_memory_bw") or 0.0),
            "bound": val(r, "bound_by"),
            "category": val(r, "category"),
        }
        for r in d["rows"]
    ]


def test_device_busy_matches_benchlog(ops):
    total = sum(o["t_ms"] for o in ops)
    assert abs(total - 602.8) < 2.0, total  # BENCHLOG: 602.8 ms/step


def test_speed_of_light_floor_matches_benchlog(ops):
    floor = sum(
        o["t_ms"] * min(o["bw"] / HBM_PEAK_GBPS, 1.0)
        if (o["bound"] == "HBM" and o["bw"]) else o["t_ms"]
        for o in ops
    )
    assert abs(floor - 536.6) < 2.0, floor  # BENCHLOG: 536.6 ms/step
    # the floor itself exceeds the 512 ms/step that 4,000 img/s requires:
    # the v5e cannot reach the (v4-hardware) BASELINE target with this
    # program's traffic — the basis of BENCHLOG's ceiling claim
    assert floor > 2048 / 4000 * 1e3


def test_hbm_traffic_matches_benchlog(ops):
    gb = sum(o["t_ms"] * o["bw"] / 1e3 for o in ops if o["bound"] == "HBM")
    assert abs(gb - 419.6) < 2.0, gb  # BENCHLOG: 419.6 GB/step


def test_convs_dominate_and_run_near_peak(ops):
    conv = sum(o["t_ms"] for o in ops if o["category"] == "convolution fusion")
    total = sum(o["t_ms"] for o in ops)
    assert 0.5 < conv / total < 0.7  # BENCHLOG: 60%


class TestMultichipScaling:
    """Committed mesh-scaling artifact (scripts/bench_multichip.py
    --scaling_table): the same global batch on 1/2/4/8-device meshes must
    produce equal losses on two CHAINED steps — mesh size is an execution
    detail, not a semantics knob (SURVEY §2.3 global-batch NT-Xent)."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "multichip_scaling.json",
    )

    @pytest.fixture(scope="class")
    def table(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("multichip_scaling.json missing — run "
                        "scripts/bench_multichip.py --scaling_table")
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_covers_1_2_4_8(self, table):
        assert [r["mesh"] for r in table["rows"]] == [1, 2, 4, 8]

    def test_loss_equal_across_mesh_sizes(self, table):
        rows = table["rows"]
        for key in ("loss_step1", "loss_step2"):
            base = rows[0][key]
            for r in rows[1:]:
                assert abs(r[key] - base) <= 5e-5 * abs(base), (key, rows)


class TestHostPipeline:
    """Committed host-pipeline artifact (scripts/bench_host_pipeline.py):
    the end-to-end measurement behind BENCHLOG's host-requirements table
    (VERDICT r2 #3).  Values are rig-specific; what must hold is the
    internal accounting."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "host_pipeline.json",
    )

    @pytest.fixture(scope="class")
    def hp(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("host_pipeline.json missing — run "
                        "scripts/bench_host_pipeline.py")
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_bound_by_is_the_slowest_stage(self, hp):
        rates = {"host": hp["host_only_img_s"],
                 "device": hp["device_only_img_s"],
                 "transfer": hp["transfer_img_s"]}
        assert hp["bound_by"] == min(rates, key=rates.get)

    def test_sustained_cannot_beat_the_binding_stage(self, hp):
        rates = (hp["host_only_img_s"], hp["device_only_img_s"],
                 hp["transfer_img_s"])
        assert hp["sustained_img_s"] <= min(rates) * 1.05, hp

    def test_host_core_requirement_is_modest(self, hp):
        # the transferable claim: a handful of decode cores feeds the chip
        assert 0 < hp["host_cores_needed_for_device_rate"] <= 8, hp

    def test_device_rate_matches_bench(self, hp):
        # the device-only leg must be the bench.py number, not a degraded
        # path (same recipe: microbatch 128 x accum 16)
        assert hp["device_only_img_s"] > 3500, hp


class TestRound3Trace:
    """Round-3 trace artifact (Pallas shifter + packed carry) must keep
    supporting BENCHLOG's round-3 claims: device busy 544.9 ms/step and a
    486 ms/step floor (4,214 img/s) — the numbers behind '89% of floor'."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "hlo_stats_r3.json.gz",
    )
    STEPS = 10

    @pytest.fixture(scope="class")
    def ops3(self):
        with gzip.open(self.ARTIFACT, "rt") as f:
            d = json.load(f)
        cols = [c["id"] for c in d["cols"]]
        idx = {c: i for i, c in enumerate(cols)}

        def val(row, col):
            v = row["c"][idx[col]]
            return v.get("v") if isinstance(v, dict) else v

        return [
            {
                "t_ms": float(val(r, "total_self_time") or 0.0) / 1e3
                / self.STEPS,
                "bw": float(val(r, "measured_memory_bw") or 0.0),
                "bound": val(r, "bound_by"),
                "category": val(r, "category"),
            }
            for r in d["rows"]
        ]

    def test_device_busy(self, ops3):
        total = sum(o["t_ms"] for o in ops3)
        assert abs(total - 544.9) < 2.0, total

    def test_floor_allows_baseline_target(self, ops3):
        floor = sum(
            o["t_ms"] * min(o["bw"] / HBM_PEAK_GBPS, 1.0)
            if (o["bound"] == "HBM" and o["bw"]) else o["t_ms"]
            for o in ops3
        )
        assert abs(floor - 486.0) < 2.0, floor
        # unlike round 2, the floor is now BELOW the 512 ms/step that the
        # 4,000 img/s BASELINE target requires: the program's ceiling on
        # this v5e clears the target
        assert floor < 2048 / 4000 * 1e3

    def test_shift_selects_gone(self, ops3):
        """The XLA barrel's roll/select loop fusions (~147 ms/step in r2)
        must stay collapsed: loop fusion total < 80 ms/step now."""
        loop = sum(o["t_ms"] for o in ops3 if o["category"] == "loop fusion")
        assert loop < 80.0, loop


def _load_trace(name, steps):
    path = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts", name
    )
    with gzip.open(path, "rt") as f:
        d = json.load(f)
    cols = [c["id"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}

    def val(row, col):
        v = row["c"][idx[col]]
        return v.get("v") if isinstance(v, dict) else v

    return [
        {
            "t_ms": float(val(r, "total_self_time") or 0.0) / 1e3 / steps,
            "bw": float(val(r, "measured_memory_bw") or 0.0),
            "bound": val(r, "bound_by"),
            "category": val(r, "category"),
            "occ": float(val(r, "occurrences") or 0.0),
        }
        for r in d["rows"]
    ]


def _floor(ops):
    return sum(
        o["t_ms"] * min(o["bw"] / HBM_PEAK_GBPS, 1.0)
        if (o["bound"] == "HBM" and o["bw"]) else o["t_ms"]
        for o in ops
    )


class TestRound4Traces:
    """Round-4 refresh traces for all four phases (VERDICT r3 #5).

    The queue-3 capture opened the profiler window around warmup, so the
    window holds iters+2 steps for the pretrain/finetune phases; the step
    counts here are occurrence-derived (max occurrences / accum for the
    accum phases) and each fixture asserts that derivation against the
    trace itself.  BENCHLOG round 4 uses these corrected numbers."""

    # name, window steps, accum multiplier expected in occurrences
    SPECS = {
        "rn50": ("hlo_stats_r4.json.gz", 8, 16),
        "rn152": ("hlo_stats_r152_r4.json.gz", 6, 16),
        "finetune": ("hlo_stats_ft_r4.json.gz", 18, 1),
        "pred": ("hlo_stats_pred_r4.json.gz", 16, 1),
    }

    @pytest.fixture(scope="class")
    def traces(self):
        out = {}
        for key, (name, steps, accum) in self.SPECS.items():
            ops = _load_trace(name, steps)
            assert max(o["occ"] for o in ops) == steps * accum, (key, steps)
            out[key] = ops
        return out

    def test_rn50_busy_and_floor(self, traces):
        busy, floor = sum(o["t_ms"] for o in traces["rn50"]), _floor(
            traces["rn50"])
        assert abs(busy - 516.6) < 2.0, busy   # BENCHLOG r4 table
        assert abs(floor - 460.5) < 2.0, floor  # 4,447 img/s ceiling
        assert floor < 2048 / 4000 * 1e3  # target remains inside envelope

    def test_rn152_busy_and_floor(self, traces):
        busy, floor = sum(o["t_ms"] for o in traces["rn152"]), _floor(
            traces["rn152"])
        assert abs(busy - 980.9) < 4.0, busy
        assert abs(floor - 875.9) < 4.0, floor  # 2,338 img/s ceiling

    def test_finetune_busy_and_floor(self, traces):
        busy, floor = sum(o["t_ms"] for o in traces["finetune"]), _floor(
            traces["finetune"])
        assert abs(busy - 48.9) < 0.5, busy
        assert abs(floor - 43.9) < 0.5, floor  # 2,916 img/s ceiling

    def test_pred_device_busy_is_under_half_the_wall(self, traces):
        # BENCHLOG: two-pass inference is tunnel-dispatch-bound, not
        # device-bound — busy 23.0 ms of a 47.9 ms wall step
        busy = sum(o["t_ms"] for o in traces["pred"])
        assert abs(busy - 23.0) < 0.5, busy
        assert _floor(traces["pred"]) > busy * 0.9  # already near its floor

    def test_all_phases_conv_dominated(self, traces):
        for key, ops in traces.items():
            conv = sum(o["t_ms"] for o in ops
                       if o["category"] == "convolution fusion")
            busy = sum(o["t_ms"] for o in ops)
            assert conv / busy > 0.65, (key, conv / busy)


class TestAutoLayout:
    """Auto input-layout A/B artifact (scripts/bench_auto_layout.py): XLA's
    preferred host-batch layouts LOSE to the default row-major inputs
    (BENCHLOG round 4) — pins the measured rejection so the lever is not
    blindly retried."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "auto_layout.json",
    )

    def test_rejection_recorded(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("auto_layout.json missing — run "
                        "scripts/bench_auto_layout.py on the TPU")
        with open(self.ARTIFACT) as f:
            al = json.load(f)
        assert al["speedup"] < 1.005, al  # no win was left unclaimed
        assert al["default"] > 3500, al   # measured on the real recipe


class TestPallasParity:
    """On-chip Pallas<->XLA numeric parity artifact (VERDICT r3 #2;
    scripts/pallas_parity.py on the real v5e).  The interpret=True CPU
    tests cannot catch a Mosaic miscompile; this artifact pins the REAL
    kernel compilations against the XLA shifter at recipe geometry."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "pallas_parity.json",
    )

    @pytest.fixture(scope="class")
    def pp(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("pallas_parity.json missing — run "
                        "scripts/pallas_parity.py on the TPU")
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_ran_on_tpu_and_all_cases_pass(self, pp):
        assert pp["backend"] == "tpu"
        assert pp["ok"], {k: v for k, v in pp["cases"].items()
                          if not v["pass"]}

    def test_integer_taps_exact(self, pp):
        # uint8 raw mode must match the numpy oracle bit-for-bit
        assert pp["cases"]["grouped_raw[uint8] vs numpy oracle"][
            "max_abs"] == 0.0

    def test_full_warp_error_is_rounding_scale(self, pp):
        # every enableable variant vs the XLA path: <= 2.5 intensity LSBs
        # on 0..255 data (two bf16 roundings at ~255 + tent-weight
        # rounding), with sub-LSB p999 — rounding-order divergence, not a
        # miscompile
        for name, c in pp["cases"].items():
            if name.startswith("warp[") and "vs xla" in name:
                assert c["max_abs"] <= 2.5, (name, c)
                assert c["p999"] <= 2.0, (name, c)


class TestTransferOverlap:
    """Transfer-overlap dissection artifact (VERDICT r3 #8;
    scripts/bench_transfer_overlap.py on the tunneled v5e).  The artifact
    holds one run per observed LINK REGIME, because round 4 found the
    parallel-put verdict is a property of the tunnel's state, not of the
    pipeline: on the healthy link (idle 8.8 MB/s) RPCs serialize and
    threaded puts lose 0.74x; on a degraded link (idle 4.0 MB/s) per-chunk
    RPC pipelining wins 1.46x.  What holds in EVERY regime — and what the
    pipeline adopts by default — is that sequential chunked puts never
    lose to a monolithic put (PECLR_PUT_CHUNKS/PECLR_PUT_THREADS opt into
    the parallel strategy where a deployment's link rewards it)."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "transfer_overlap.json",
    )

    @pytest.fixture(scope="class")
    def ov(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("transfer_overlap.json missing — run "
                        "scripts/bench_transfer_overlap.py on the TPU")
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_both_link_regimes_recorded(self, ov):
        # the non-replication is the finding: keep >=1 run per regime
        speedups = [r["verdict"]["parallel_put_speedup"] for r in ov["runs"]]
        assert any(s < 1.0 for s in speedups), "healthy-link run missing"
        assert any(s > 1.0 for s in speedups), "degraded-link run missing"

    def test_chunked_sequential_put_never_loses(self, ov):
        # the adopted default strategy: within noise of (or better than)
        # the monolithic put in EVERY observed regime
        for run in ov["runs"]:
            c = run["cases"]
            assert c["put_chunk_seq"]["s"] <= c["put_idle"]["s"] * 1.05, (
                run["label"])

    def test_no_large_unclaimed_pipeline_win(self, ov):
        # in every regime the best strategy buys <=2x over the adopted
        # default — the feeding pipeline is link-bound, not strategy-bound
        for run in ov["runs"]:
            c = run["cases"]
            best = min(v["s"] for k, v in c.items() if k.startswith("put_")
                       and "s" in v and k != "put_during_step")
            assert c["put_chunk_seq"]["s"] <= best * 2.0, run["label"]


class TestServingLatency:
    """scripts/bench_serving.py on the real v5e: the InferenceSession's
    synchronous request latency and its chained (data-dependency) device
    bound per compiled batch size.  Measured (RN50, 128px): chained 1.46 ms
    @ batch 1 (dispatch floor) -> 5.08 ms @ 128 = 25,200 img/s; sync p50
    108 -> 274 ms, dominated by the tunnel RPC + image upload."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "serving_latency.json",
    )

    @pytest.fixture(scope="class")
    def sl(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("serving_latency.json missing — run "
                        "scripts/bench_serving.py on the TPU")
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_ran_on_tpu_and_covers_the_batch_sweep(self, sl):
        assert sl["backend"] == "tpu"
        assert [r["batch"] for r in sl["rows"]] == [1, 8, 32, 128]

    def test_batching_amortizes(self, sl):
        # throughput must rise with every batch-size step: small batches
        # are dispatch-latency bound, big ones compute bound
        rates = [r["chained_img_per_s"] for r in sl["rows"]]
        assert all(b > a for a, b in zip(rates, rates[1:])), rates

    def test_single_request_is_dispatch_bound(self, sl):
        # batch-1 chained step is the per-dispatch floor, far under the
        # batch-128 compute time: serving must batch
        by = {r["batch"]: r for r in sl["rows"]}
        assert by[1]["chained_ms"] < 10.0
        assert by[128]["chained_ms"] > 2 * by[1]["chained_ms"]

    def test_batch128_beats_the_two_pass_predictor_bound(self, sl):
        # single-pass inference must beat the two-pass pred_fh device bound
        # (5,845 img/s, TestRound4Traces) with clear margin
        by = {r["batch"]: r for r in sl["rows"]}
        assert by[128]["chained_img_per_s"] > 8000

    def test_sync_latency_is_deployment_sane(self, sl):
        for r in sl["rows"]:
            assert r["sync_ms_p99"] >= r["sync_ms_p50"]
            assert r["sync_ms_p50"] < 1000.0, r


class TestTransferOverlapAppend:
    """scripts/bench_transfer_overlap.py append_run: the multi-run artifact
    grows one entry per link regime, and a legacy single-run file ({cases,
    verdict} top-level) is converted, not clobbered."""

    @staticmethod
    def _load_append():
        import importlib.util

        path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                            "bench_transfer_overlap.py")
        spec = importlib.util.spec_from_file_location(
            "bench_transfer_overlap", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.append_run

    def test_appends_and_converts_legacy(self, tmp_path):
        append_run = self._load_append()
        out = str(tmp_path / "ov.json")
        legacy = {"batch_mb": 1.0,
                  "cases": {"put_idle": {"s": 2.0}},
                  "verdict": {"parallel_put_speedup": 0.9}}
        with open(out, "w") as f:
            json.dump(legacy, f)
        run = {"label": "new", "cases": {"put_idle": {"s": 1.0}},
               "verdict": {"parallel_put_speedup": 1.2}}
        art = append_run(out, 1.0, run)
        assert [r["label"] for r in art["runs"]] == ["legacy", "new"]
        assert art["runs"][0]["verdict"]["parallel_put_speedup"] == 0.9
        # second append extends, does not re-convert
        art2 = append_run(out, 1.0, dict(run, label="third"))
        assert [r["label"] for r in art2["runs"]] == ["legacy", "new", "third"]
        with open(out) as f:
            assert len(json.load(f)["runs"]) == 3

    def test_fresh_file(self, tmp_path):
        append_run = self._load_append()
        out = str(tmp_path / "ov.json")
        art = append_run(out, 5.0, {"label": "a", "cases": {}, "verdict": {}})
        assert art["batch_mb"] == 5.0 and len(art["runs"]) == 1


class TestBenchGuard:
    """Perf regression guard artifact (scripts/bench_guard.py, VERDICT r4
    next #5): all four phases re-measured on the real chip must hold the
    frozen-by-argument throughput within the day-spread band, and the
    artifact must be FRESH — if any device hot-path source changed since
    the guard last ran, this suite flags the artifact as stale so a
    refactor can't silently eat the 3,9xx."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts", "bench_guard.json"
    )

    @staticmethod
    def _guard_mod():
        import importlib.util

        path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                            "bench_guard.py")
        spec = importlib.util.spec_from_file_location("bench_guard", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @pytest.fixture(scope="class")
    def guard(self):
        if not os.path.exists(self.ARTIFACT):
            pytest.fail("bench_guard.json missing — run "
                        "scripts/bench_guard.py on the TPU")
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_ran_on_tpu_and_all_phases_pass(self, guard):
        assert guard["backend"] == "tpu"
        assert guard["ok"] is True
        assert set(guard["phases"]) == {
            "pretrain_rn50", "pretrain_rn152", "finetune", "pred",
        }
        for name, p in guard["phases"].items():
            assert p["pass"] and p["ratio"] >= p["band"], (name, p)

    def test_references_match_benchlog_round4(self, guard):
        refs = {k: p["reference_img_per_sec"]
                for k, p in guard["phases"].items()}
        assert refs["pretrain_rn50"] == pytest.approx(3907.0)
        assert refs["pretrain_rn152"] == pytest.approx(2072.6)
        assert refs["finetune"] == pytest.approx(2413.0)
        assert refs["pred"] == pytest.approx(2670.0)
        # pretrain steps amortize the tunnel dispatch gap (band 0.98); the
        # ~50/25 ms phases carry the gap's day swing (band 0.90, with the
        # trace-anchored device busy recorded for diagnosis — BENCHLOG r5)
        bands = {k: p["band"] for k, p in guard["phases"].items()}
        assert bands == {"pretrain_rn50": 0.98, "pretrain_rn152": 0.98,
                         "finetune": 0.90, "pred": 0.90}
        for k in ("finetune", "pred"):
            # sanity only: wall can never sit below device busy (the gap
            # itself legitimately swings 4-25 ms across sessions and the
            # 0.90 band is the acceptance criterion, not a gap cap)
            assert guard["phases"][k]["implied_gap_ms"] > -1.0

    def test_artifact_is_fresh_vs_hot_path_sources(self, guard):
        """Recompute the hot-path hash over the working tree: a mismatch
        means device-hot-path code changed after the guard last ran — the
        committed numbers no longer describe this tree.  Re-run
        scripts/bench_guard.py on the chip."""
        mod = self._guard_mod()
        assert guard["hot_path_hash"] == mod.hot_path_hash(), (
            "bench_guard.json is STALE: hot-path sources changed since the "
            "guard ran — re-run scripts/bench_guard.py on the TPU"
        )


class TestPredPipeline:
    """pred_fh dispatch-pipelining A/B (scripts/bench_pred_pipeline.py,
    VERDICT r4 next #4): keeping batches in flight must recover the
    tunnel's dispatch gap — >=0.8x of the device bound at the default
    depth, vs 0.44x for the round-4 serial fetch-then-dispatch loop."""

    ARTIFACT = os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "pred_pipeline.json",
    )

    @pytest.fixture(scope="class")
    def pp(self):
        with open(self.ARTIFACT) as f:
            return json.load(f)

    def test_ran_on_tpu_with_serial_reference(self, pp):
        assert pp["backend"] == "tpu"
        assert "1" in pp["depths"] and str(pp["best_depth"]) in pp["depths"]
        assert pp["best_depth"] >= 2

    def test_pipelining_recovers_the_dispatch_gap(self, pp):
        assert pp["speedup_vs_serial"] >= 1.5, pp
        assert pp["fraction_of_device_bound"] >= 0.8, pp

    def test_device_bound_matches_round4_trace(self, pp):
        # 23.0 ms busy per batch-128 two-pass (hlo_stats_pred_r4, judge-
        # recomputed) -> 5,565 img/s
        assert pp["device_busy_ms_per_batch"] == pytest.approx(23.0)
        assert pp["device_bound_img_per_sec"] == pytest.approx(
            pp["batch"] / 0.023, rel=1e-3
        )
