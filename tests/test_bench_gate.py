"""bench_compare --gate (VERDICT r13 #3): the r13 same-code A/B archives
quantified the bench noise band (sub-second entries swing ±140% between
identical-code runs; drift-adjusted totals move ~+12%); the gate encodes it
so 'no regression' is asserted from the archive, not argued in prose. These
tests pin the decision function on doctored archives: synthetic multi-second
slowdowns FAIL, noise-band wobble and pure host drift PASS."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

from bench_compare import gate_failures, host_drift  # noqa: E402


def _archive(queries, calib=None, triggers=None):
    return {
        "bench_protocol": "grouped-warmup-v2",
        "queries": queries,
        "calibration": calib if calib is not None else {"calib_jvm_sum": 1.0},
        "triggers": triggers or {},
    }


def test_host_drift_is_median_of_fixed_code_ratios():
    old = _archive({}, calib={"a": 1.0, "b": 2.0, "c": 4.0})
    new = _archive({}, calib={"a": 1.1, "b": 2.0, "c": 8.0})
    assert host_drift(old, new) == pytest.approx(1.1)
    assert host_drift(_archive({}, calib={}), new) is None


def test_gate_passes_identical_and_noise_band_runs():
    old = _archive({"q1": 5.0, "q2": 0.4, "q3": 0.05})
    # same-code noise: sub-second entries swinging hard, big one stable
    new = _archive({"q1": 5.3, "q2": 0.9, "q3": 0.12})
    fails, drift = gate_failures(old, new)
    assert fails == [] and drift == 1.0


def test_gate_fails_on_synthetic_multisecond_slowdown():
    old = _archive({"q1": 5.0, "q2": 1.0})
    new = _archive({"q1": 12.0, "q2": 1.0})  # +7 s, +140% — beyond any noise
    fails, _ = gate_failures(old, new)
    assert len(fails) == 1 and fails[0].startswith("q1:")


def test_gate_requires_both_abs_and_rel():
    # +3 s but only +10% of a 30 s entry: absolute alone must not fail
    old = _archive({"q1": 30.0})
    fails, _ = gate_failures(old, _archive({"q1": 33.0}))
    assert fails == []
    # +150% but only +0.45 s: relative alone must not fail (noise band)
    old = _archive({"q1": 0.3})
    fails, _ = gate_failures(old, _archive({"q1": 0.75}))
    assert fails == []


def test_gate_discounts_pure_host_drift():
    # host got uniformly 2x slower: calibration says so — no code regression
    old = _archive({"q1": 5.0, "q2": 8.0}, calib={"c": 1.0})
    new = _archive({"q1": 10.2, "q2": 16.1}, calib={"c": 2.0})
    fails, drift = gate_failures(old, new)
    assert fails == [] and drift == 2.0
    # and a faster host must NOT hide a real regression
    old = _archive({"q1": 5.0}, calib={"c": 2.0})
    new = _archive({"q1": 6.0}, calib={"c": 1.0})  # host 2x faster, wall UP
    fails, _ = gate_failures(old, new)
    assert len(fails) == 1  # drift-adjusted 12 s vs 5 s


def test_gate_skips_trigger_floor_artifacts():
    # a streaming entry gaining micro-batches, both sides inside the
    # 2.5 s/trigger floor band: classified as floor artifact, not regression
    old = _archive({"s1": 4.0}, triggers={"s1": 2})
    new = _archive({"s1": 10.0}, triggers={"s1": 5})
    fails, _ = gate_failures(old, new)
    assert fails == []
    # same wall jump WITHOUT the trigger-count change: fails
    new2 = _archive({"s1": 10.0}, triggers={"s1": 2})
    fails, _ = gate_failures(old, new2)
    assert len(fails) == 1


def test_gate_fails_on_broad_total_regression():
    # every entry +30%: no single entry trips the absolute bar, the
    # drift-adjusted total does
    old = _archive({f"q{i}": 1.0 for i in range(20)})
    new = _archive({f"q{i}": 1.3 for i in range(20)})
    fails, _ = gate_failures(old, new)
    assert fails and fails[-1].startswith("shared total")


def test_gate_not_computable_without_calibration():
    with pytest.raises(ValueError, match="calibration"):
        gate_failures(_archive({}, calib={}), _archive({}, calib={}))


def test_gate_cli_exit_codes(tmp_path):
    ok_old = tmp_path / "old.json"
    ok_new = tmp_path / "new.json"
    bad_new = tmp_path / "bad.json"
    ok_old.write_text(json.dumps(_archive({"q1": 5.0})))
    ok_new.write_text(json.dumps(_archive({"q1": 5.2})))
    bad_new.write_text(json.dumps(_archive({"q1": 15.0})))
    run = lambda *a: subprocess.run(  # noqa: E731
        [sys.executable, str(TOOLS / "bench_compare.py"), *a],
        capture_output=True,
        text=True,
    )
    assert run(str(ok_old), str(ok_new), "--gate").returncode == 0
    r = run(str(ok_old), str(bad_new), "--gate")
    assert r.returncode == 1 and "q1" in r.stdout
    # no calibration → exit 2 (cannot attribute), never a silent pass
    nc = tmp_path / "nc.json"
    nc.write_text(json.dumps(_archive({"q1": 5.0}, calib={})))
    assert run(str(nc), str(ok_new), "--gate").returncode == 2
    # default (non-gate) mode stays a pure reporting tool: exit 0
    assert run(str(ok_old), str(bad_new)).returncode == 0


def test_stream_drift_adjusts_streaming_entries_only():
    from bench_compare import stream_drift

    calib_old = {"calib_jvm_sum": 1.0, "calib_stream_state": 1.0}
    # the host's trigger-floor class got 2x slower while compute is flat —
    # the r14 host-class shift the compute-only drift was blind to
    calib_new = {"calib_jvm_sum": 1.0, "calib_stream_state": 2.0}
    old = _archive(
        {"strm": 5.0, "batch": 5.0},
        calib=calib_old,
        triggers={"strm": 4, "batch": 0},
    )
    new = _archive(
        {"strm": 10.0, "batch": 5.2},
        calib=calib_new,
        triggers={"strm": 4, "batch": 0},
    )
    assert stream_drift(old, new) == pytest.approx(2.0)
    fails, drift = gate_failures(old, new)
    # the streaming 2x is fully explained by the stream-floor drift; the
    # batch entry is within noise — gate passes
    assert fails == [] and drift == pytest.approx(1.0)


def test_stream_drift_does_not_excuse_batch_regressions():
    calib = {"calib_jvm_sum": 1.0, "calib_stream_state": 1.0}
    calib_new = {"calib_jvm_sum": 1.0, "calib_stream_state": 2.0}
    old = _archive({"batch": 5.0}, calib=calib, triggers={"batch": 0})
    new = _archive({"batch": 10.0}, calib=calib_new, triggers={"batch": 0})
    fails, _ = gate_failures(old, new)
    assert len(fails) == 1 and "batch" in fails[0]


def test_compute_drift_ignores_the_new_calibration_classes():
    # a 10x metadata/stream shift must not drag the compute median
    old = _archive(
        {},
        calib={
            "calib_jvm_sum": 1.0,
            "calib_parquet_scan": 1.0,
            "calib_shuffle_agg": 1.0,
            "calib_small_files": 1.0,
            "calib_stream_state": 1.0,
        },
    )
    new = _archive(
        {},
        calib={
            "calib_jvm_sum": 1.0,
            "calib_parquet_scan": 1.1,
            "calib_shuffle_agg": 1.0,
            "calib_small_files": 10.0,
            "calib_stream_state": 10.0,
        },
    )
    assert host_drift(old, new) == pytest.approx(1.0)


def test_stream_drift_none_when_either_side_lacks_it():
    from bench_compare import stream_drift

    old = _archive({}, calib={"calib_jvm_sum": 1.0})
    new = _archive(
        {}, calib={"calib_jvm_sum": 1.0, "calib_stream_state": 1.5}
    )
    assert stream_drift(old, new) is None
    assert stream_drift(new, new) == pytest.approx(1.0)
