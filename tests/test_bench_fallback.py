"""Wedge-proof bench harness tests (VERDICT r3 #1).

The round-3 driver bench record was a raw traceback because bench.py called
jax.devices() cold while the axon tunnel was down. These tests pin the
repaired contract: the probe is subprocess-isolated with retry/backoff, and
on persistent unavailability bench.py emits ONE parseable JSON record
(exit 0) citing committed artifacts — never a traceback. All CPU-only.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _args(**over):
    ns = argparse.Namespace(cpu=False, width=128, metric="point", lo=10,
                            hi=60, repeats=5, matcher=None,
                            probe_deadline=1.0, smoke=False)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_probe_fast_failure_retries_until_deadline(monkeypatch):
    monkeypatch.setenv("FPCR_BENCH_PROBE_CMD", "false")
    t0 = time.monotonic()
    assert bench.probe_tpu(1.5) is False
    # must actually have waited out the deadline (retry loop, not one shot)
    assert time.monotonic() - t0 >= 1.0


def test_probe_success(monkeypatch):
    monkeypatch.setenv("FPCR_BENCH_PROBE_CMD", "true")
    assert bench.probe_tpu(5.0) is True


def test_probe_hang_gets_one_patient_probe_then_gives_up(monkeypatch):
    monkeypatch.setenv("FPCR_BENCH_PROBE_CMD", "sleep 600")
    t0 = time.monotonic()
    assert bench.probe_tpu(2.0) is False
    elapsed = time.monotonic() - t0
    # quick probe (2s cap) + nothing left for the patient probe
    assert elapsed < 30.0


def test_fallback_record_is_parseable_and_cites_artifacts(capsys):
    bench.emit_fallback(_args(), "test reason", 1.2, with_cpu_sanity=False)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    # the driver contract: metric/value/unit/vs_baseline always present
    assert rec["metric"] == "icp_point_to_point_ms_per_iter_n16384"
    assert isinstance(rec["value"], float) and rec["value"] > 0
    assert rec["unit"] == "ms"
    assert 0 < rec["vs_baseline"] < 1  # committed TPU numbers beat the ref
    # the honesty contract: provenance is explicit
    assert rec["platform"] == "unavailable"
    assert "tpu_report.json" in rec["value_source"]
    assert rec["reason"] == "test reason"


def test_fallback_plane_metric_uses_plane_baseline(capsys):
    bench.emit_fallback(_args(metric="plane"), "r", 0.0,
                        with_cpu_sanity=False)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["metric"] == "icp_point_to_plane_ms_per_iter_n16384"
    assert rec["baseline"]["ms_per_iter"] == bench.BASELINE_PLANE_MS_PER_ITER_16384


def test_committed_artifact_loader_reads_report():
    committed = bench._load_committed()
    assert committed["point"] > 0 and committed["plane"] > 0
    assert "tpu_report.json" in committed["source"]


@pytest.mark.slow
def test_bench_exits_zero_with_record_when_tunnel_dead():
    """End-to-end: kill the tunnel (probe forced to fail) -> rc 0 + JSON.

    This is the verdict's done-criterion, minus the real tunnel kill
    (the probe override stands in for it). Slow: includes the CPU sanity
    subprocess (~1 min).
    """
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        env={**__import__("os").environ,
             "FPCR_BENCH_PROBE_CMD": "false",
             "FPCR_BENCH_PROBE_DEADLINE_S": "2"},
        capture_output=True, text=True, timeout=900, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["platform"] == "unavailable"
    assert rec["cpu_sanity"] is not None
    assert rec["cpu_sanity"]["ms_per_iter"] > 0
