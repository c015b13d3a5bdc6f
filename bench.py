"""Headline benchmark: point-to-point ICP ms/iteration at N=16,384.

Reference baseline (BASELINE.md): 6.4944 ms per ICP iteration at N=16,384 on
an RTX 2060 (src/CUDA/csv_files/GPU_ICP_point_to_point_TimeComp.csv), the
reference's own headline number. This times the same workload — full ICP
iterations (matching + Kabsch solve + transform + error) on the synthetic
128x128 z=x²-y² scene — and prints ONE JSON line:

    {"metric": ..., "value": <ms/iter>, "unit": "ms",
     "vs_baseline": <value / 6.4944>}   # < 1.0 means faster than the ref GPU

Measurement notes (this environment):
  * the axon TPU tunnel memoizes identical executions server-side, so every
    timed run perturbs the inputs (same epsilon added to source AND target —
    an identical registration problem, different bits);
  * each device call carries ~25 ms of tunnel RPC overhead, so the
    per-iteration cost is the SLOPE between a short and a long run
    (ms/iter = (T(hi) - T(lo)) / (hi - lo)), min-of-k each — the same
    fixed-cost elimination the reference's min-of-10 policy aims at
    (Matching_opt.cu:213-226);
  * the tunnel can be DOWN (fast UNAVAILABLE) or WEDGED (backend init
    hangs for many minutes while a killed client's lease expires). This
    script is wedge-proof AND kill-proof: main() prints a provisional
    fallback record ("platform": "pending-probe", committed-artifact
    values) as its FIRST action, so an external SIGKILL at ANY moment
    still leaves a parseable last stdout line (VERDICT r4 #1 — drivers
    read the last parseable line; later prints supersede earlier ones).
    It then probes in subprocesses with patient retry/backoff (default
    10 min, --probe-deadline / FPCR_BENCH_PROBE_DEADLINE_S) and on
    persistent unavailability prints the structured fallback record
    ("platform": "unavailable") IMMEDIATELY, then enriches it with a
    fresh CPU sanity value in a final line. Worst-case wall time is
    ~15 min, under any sane driver budget. A probe success followed by
    a measurement exception reports "platform": "error" instead, so
    'tunnel down' and 'bench broken' are distinguishable (ADVICE r4).

--smoke runs the full hardware gate instead: probe -> scripts/tpu_smoke.py
-> headline bench -> artifact refresh (VERDICT r3 #8).
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time

BASELINE_MS_PER_ITER_16384 = 6.4944  # RTX 2060, point metric, reference CSV
BASELINE_PLANE_MS_PER_ITER_16384 = 7.1085  # RTX 2060, plane metric

REPO = os.path.dirname(os.path.abspath(__file__))

# last-resort committed values (bench_results/tpu_report.json, round 5);
# _load_committed() re-reads the artifact at runtime — these constants only
# back it up if the artifact itself is unreadable.
LAST_COMMITTED = {
    "point_ms_per_iter_16384": 0.5978,
    "plane_ms_per_iter_16384": 0.5277,
    "source": "bench_results/tpu_report.json icp_ladder_16384.pallas "
              "(TPU, round 5 final refresh, 2026-08-19; session clock "
              "spread 0.50-0.60)",
}


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# TPU availability probe (wedge discipline — see .claude/skills/verify):
#  * backend init can FAIL FAST (tunnel down: UNAVAILABLE within seconds) or
#    HANG (wedged lease: jax.devices() blocks for many minutes);
#  * a probe process killed mid-init RENEWS the wedged lease, so hangs get
#    ONE long-patient probe with the whole remaining budget, never a
#    kill/retry loop;
#  * fast failures are retried with linear backoff until the deadline.
# The probe runs in a subprocess so a hang can never wedge this process and
# the main process only touches the backend after a probe succeeded.
# ---------------------------------------------------------------------------

_PROBE_CODE = (
    "import jax, sys; d = jax.devices(); "
    "sys.exit(0 if d and d[0].platform == 'tpu' else 3)"
)


def _probe_cmd() -> list:
    override = os.environ.get("FPCR_BENCH_PROBE_CMD")
    if override:
        return shlex.split(override)
    return [sys.executable, "-c", _PROBE_CODE]


def probe_tpu(deadline_s: float) -> bool:
    """True once a subprocess can enumerate the TPU; False past deadline."""
    cmd = _probe_cmd()
    deadline = time.monotonic() + deadline_s
    attempt = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        attempt += 1
        quick = min(300.0, remaining)
        t0 = time.monotonic()
        try:
            rc = subprocess.run(cmd, timeout=quick, capture_output=True,
                                cwd=REPO).returncode
        except subprocess.TimeoutExpired:
            # Hang = wedged lease. Killed probes renew the claim, so spend
            # the entire remaining budget on one patient probe: a live
            # client waiting in backend init succeeds the moment the lease
            # clears.
            remaining = deadline - time.monotonic()
            if remaining <= 1:
                return False
            _log(f"probe attempt {attempt} hung {quick:.0f}s (wedged "
                 f"tunnel?); one long-patient probe for {remaining:.0f}s")
            try:
                rc = subprocess.run(cmd, timeout=remaining,
                                    capture_output=True, cwd=REPO).returncode
            except subprocess.TimeoutExpired:
                return False
            return rc == 0
        if rc == 0:
            if attempt > 1:
                _log(f"probe attempt {attempt} succeeded")
            return True
        elapsed = time.monotonic() - t0
        sleep_s = min(60.0 * attempt, 300.0, deadline - time.monotonic())
        if sleep_s <= 0:
            return False
        _log(f"probe attempt {attempt} failed fast (rc={rc}, "
             f"{elapsed:.1f}s) — backend unavailable; retry in "
             f"{sleep_s:.0f}s")
        time.sleep(sleep_s)


# ---------------------------------------------------------------------------
# Structured fallback record (VERDICT r3 #1): when the chip is unreachable
# the bench must still exit 0 with ONE parseable JSON line — citing the last
# committed TPU numbers by artifact path plus a fresh CPU sanity value —
# never a raw traceback.
# ---------------------------------------------------------------------------

def _load_committed() -> dict:
    """Last committed TPU headline numbers, cited by artifact path."""
    path = os.path.join(REPO, "bench_results", "tpu_report.json")
    out = {
        "point": LAST_COMMITTED["point_ms_per_iter_16384"],
        "plane": LAST_COMMITTED["plane_ms_per_iter_16384"],
        "source": LAST_COMMITTED["source"],
    }
    try:
        with open(path) as fh:
            rep = json.load(fh)
        out["point"] = float(rep["icp_ladder_16384"]["pallas"])
        # sweep rows are [n, ms] (r3) or [n, ms, below_noise_floor] (r4+)
        plane = [row[1] for row in rep.get("sweep_plane", [])
                 if row and row[0] == 16384]
        if plane:
            out["plane"] = float(plane[0])
        out["source"] = (f"bench_results/tpu_report.json (round "
                         f"{rep.get('round')}, platform "
                         f"{rep.get('platform')}): icp_ladder_16384.pallas; "
                         f"plane from sweep_plane n=16384")
    except Exception as exc:  # artifact unreadable → constants above
        _log(f"committed-artifact read failed ({exc}); using constants")
    return out


def _cpu_sanity(timeout_s: float = 240.0) -> dict | None:
    """Small fresh CPU measurement proving the code path itself is alive.

    Runs this same script with --cpu on a width-32 scene in a subprocess
    (the main process may already hold a broken TPU backend)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--cpu",
           "--width", "32", "--lo", "2", "--hi", "10", "--repeats", "2"]
    try:
        proc = subprocess.run(cmd, timeout=timeout_s, capture_output=True,
                              text=True, cwd=REPO)
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        return {"ms_per_iter": rec["value"], "n_points": 1024,
                "platform": "cpu"}
    except Exception as exc:
        _log(f"cpu sanity run failed ({exc})")
        return None


def _fallback_record(args, platform: str, reason: str,
                     probe_seconds: float) -> dict:
    committed = _load_committed()
    metric_key = "plane" if args.metric == "plane" else "point"
    baseline = (BASELINE_PLANE_MS_PER_ITER_16384 if args.metric == "plane"
                else BASELINE_MS_PER_ITER_16384)
    name = ("icp_point_to_plane" if args.metric == "plane"
            else "icp_point_to_point")
    value = committed[metric_key]
    return {
        "metric": f"{name}_ms_per_iter_n{args.width * args.width}",
        "value": round(value, 4),
        "unit": "ms",
        "vs_baseline": round(value / baseline, 4),
        "platform": platform,
        "reason": reason,
        "probe_seconds": round(probe_seconds, 1),
        "value_source": committed["source"],
        "committed_point_ms_per_iter": committed["point"],
        "committed_plane_ms_per_iter": committed["plane"],
        "cpu_sanity": None,
        "baseline": {"ms_per_iter": baseline, "hardware": "RTX 2060"},
    }


def emit_fallback(args, reason: str, probe_seconds: float,
                  with_cpu_sanity: bool = True,
                  platform: str = "unavailable") -> None:
    """Print the fallback record IMMEDIATELY, then (optionally) an
    enriched copy carrying a fresh CPU sanity value. An external kill
    between the two lines still leaves the first as a parseable record
    (VERDICT r4 #1: record-first, enrich-later)."""
    record = _fallback_record(args, platform, reason, probe_seconds)
    print(json.dumps(record), flush=True)
    if with_cpu_sanity:
        sanity = _cpu_sanity()
        if sanity is not None:
            record["cpu_sanity"] = sanity
            print(json.dumps(record), flush=True)


def _timed_run(run, src, tgt, eps, repeats):
    """(min wall seconds, last run's result) — returning the result lets
    callers read final errors without paying an extra full registration."""
    import jax

    times = []
    res = None
    for r in range(repeats):
        s = src + eps * (r + 1)
        t = tgt + eps * (r + 1)
        jax.block_until_ready((s, t))
        float(s[0, 0])  # real sync (see below)
        t0 = time.perf_counter()
        res = run(s, t)
        # force a real device->host sync: through the axon tunnel,
        # block_until_ready returns at enqueue time, not completion.
        float(res.errors[-1])
        times.append(time.perf_counter() - t0)
    return min(times), res


def _parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--width", type=int, default=128, help="grid width (N=width²)")
    parser.add_argument("--metric", default="point", choices=["point", "plane"],
                        help="plane adds the reference's 7.109 ms baseline")
    parser.add_argument("--lo", type=int, default=10, help="short run iterations")
    parser.add_argument("--hi", type=int, default=60, help="long run iterations")
    parser.add_argument("--repeats", type=int, default=5, help="timed repeats (min taken)")
    parser.add_argument("--matcher", default=None,
                        choices=["xla", "pallas", "morton"],
                        help="default: 'pallas' on TPU (exact fused brute "
                             "kernel), 'xla' elsewhere. Both are exact and "
                             "converge from the reference scene's large "
                             "displacement. 'morton' is the banded fast "
                             "path (near-registered regime only; its "
                             "numbers go in the details record).")
    parser.add_argument("--probe-deadline", type=float,
                        default=float(os.environ.get(
                            "FPCR_BENCH_PROBE_DEADLINE_S", "600")),
                        help="seconds to keep probing for the TPU before "
                             "emitting the structured fallback record "
                             "(env FPCR_BENCH_PROBE_DEADLINE_S)")
    parser.add_argument("--smoke", action="store_true",
                        help="hardware gate: patient probe -> "
                             "scripts/tpu_smoke.py -> headline bench -> "
                             "artifact refresh (scripts/tpu_report.py); "
                             "exit code reflects smoke+bench status")
    args = parser.parse_args(argv)
    if args.width < 2 or args.repeats < 1 or args.hi <= args.lo:
        parser.error("need width>=2, repeats>=1, hi>lo")
    if args.matcher == "morton":
        parser.error("'morton' is the banded fast path for near-registered "
                     "clouds; the headline scene's 0.8-unit displacement is "
                     "outside its regime. Its valid-regime number is always "
                     "in the details record (morton_fast_path_ms_per_iter_"
                     "near_registered).")
    return args


def measure(args) -> None:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import fpcr_tpu as f

    if args.matcher is None:
        args.matcher = "pallas" if jax.devices()[0].platform == "tpu" else "xla"

    n = args.width * args.width
    scene = f.synthetic_scene(width=args.width)
    source = jax.device_put(scene.source)
    target = jax.device_put(scene.target)
    eps = np.float32(1e-7)

    def make_run(iters):
        # tolerance=0 → no early exit → exactly `iters` iterations
        cfg = f.ICPConfig(metric=args.metric, max_iterations=iters,
                          tolerance=0.0, matcher=args.matcher,
                          morton_window=128)
        def run(s, t):
            return f.run_icp(s, t, cfg)
        # compile + warm
        jax.block_until_ready(run(source, target).errors)
        return run

    run_lo = make_run(args.lo)
    run_hi = make_run(args.hi)
    t_lo, _ = _timed_run(run_lo, source, target, eps, args.repeats)
    t_hi, res_hi = _timed_run(run_hi, source, target, eps, args.repeats)

    ms_per_iter = (t_hi - t_lo) * 1e3 / (args.hi - args.lo)
    if ms_per_iter <= 0:
        # slope noise (tiny workloads / few repeats): fall back to the
        # conservative total/iters bound
        ms_per_iter = t_hi * 1e3 / args.hi
    platform = jax.devices()[0].platform

    # secondary: the production morton fast path, timed in its valid regime
    # (near-registered clouds — the fine stage of the coarse-to-fine
    # pipeline; it cannot see the reference scene's 0.8-unit displacement)
    morton_ms = None
    morton_err = None
    if args.matcher in ("xla", "pallas"):
        try:
            gt_small = f.gt_transform((0.004, -0.002, 0.003),
                                      (0.002, -0.003, 0.002))
            tgt_near = jax.device_put(gt_small.apply(scene.source))

            def make_morton(iters):
                cfg = f.ICPConfig(matcher="morton", max_iterations=iters,
                                  tolerance=0.0, morton_window=128)
                def run(s, t):
                    return f.run_icp(s, t, cfg)
                float(run(source, tgt_near).errors[-1])
                return run
            m_lo, _ = _timed_run(make_morton(args.lo), source, tgt_near,
                                 eps, 3)
            m_hi, m_res = _timed_run(make_morton(args.hi), source, tgt_near,
                                     eps, 3)
            morton_ms = (m_hi - m_lo) * 1e3 / (args.hi - args.lo)
            if morton_ms <= 0:  # slope noise: conservative total/iters bound
                morton_ms = m_hi * 1e3 / args.hi
            morton_err = float(m_res.errors[args.hi - 1])
        except Exception:
            morton_ms = None

    # the reference's headline has BOTH metrics; the driver captures this
    # record, so the plane number must be in it (VERDICT r2 #3), not only
    # in bench_results/. Timed with the same slope method.
    plane_ms = None
    plane_err = None
    if args.metric == "point":
        try:
            def make_plane(iters):
                cfg = f.ICPConfig(metric="plane", max_iterations=iters,
                                  tolerance=0.0, matcher=args.matcher,
                                  morton_window=128)
                def run(s, t):
                    return f.run_icp(s, t, cfg)
                jax.block_until_ready(run(source, target).errors)
                return run
            p_lo, _ = _timed_run(make_plane(args.lo), source, target, eps, 3)
            p_hi, p_res = _timed_run(make_plane(args.hi), source, target,
                                     eps, 3)
            plane_ms = (p_hi - p_lo) * 1e3 / (args.hi - args.lo)
            if plane_ms <= 0:
                plane_ms = p_hi * 1e3 / args.hi
            plane_err = float(p_res.errors[args.hi - 1])
        except Exception:
            plane_ms = None

    # NDT on the same scene size (no reference baseline — beyond-reference
    # capability; the fused direct7 Pallas kernel, BENCH_NOTES §NDT)
    ndt_ms = None
    ndt_err = None
    if args.metric == "point" and platform == "tpu":
        try:
            from fpcr_tpu.models.ndt import NDTConfig, run_ndt
            gt_n = f.gt_transform((0.004, -0.002, 0.003),
                                  (0.002, -0.003, 0.002))
            tgt_n = jax.device_put(gt_n.apply(scene.source))
            grid = f.build_ndt_grid(tgt_n, 0.12)
            jax.block_until_ready(grid.table)

            def make_ndt(iters):
                cfg = NDTConfig(voxel_size=0.12, max_iterations=iters,
                                tolerance=0.0, lookup="banded",
                                lookup_impl="auto")
                def run(s, t):
                    return run_ndt(s, t, cfg, grid=grid)
                float(run(source, tgt_n).errors[0])
                return run
            n_lo, _ = _timed_run(make_ndt(args.lo), source, tgt_n, eps, 3)
            n_hi, n_res = _timed_run(make_ndt(args.hi), source, tgt_n, eps, 3)
            ndt_ms = (n_hi - n_lo) * 1e3 / (args.hi - args.lo)
            if ndt_ms <= 0:
                ndt_ms = n_hi * 1e3 / args.hi
            ndt_err = float(n_res.errors[args.hi - 1])
        except Exception:
            ndt_ms = None

    details = {
        "platform": platform,
        "n_points": n,
        "matcher": args.matcher,
        "lo_iters": args.lo,
        "hi_iters": args.hi,
        "t_lo_ms": t_lo * 1e3,
        "t_hi_ms": t_hi * 1e3,
        "overhead_ms_estimate": t_lo * 1e3 - args.lo * ms_per_iter,
        "final_error_hi": float(res_hi.errors[args.hi - 1]),
        "morton_fast_path_ms_per_iter_near_registered": morton_ms,
        "morton_fast_path_final_error": morton_err,
        "plane_ms_per_iter": (None if plane_ms is None
                              else round(plane_ms, 4)),
        "plane_vs_baseline": (None if plane_ms is None else round(
            plane_ms / BASELINE_PLANE_MS_PER_ITER_16384, 4)),
        "plane_final_error": plane_err,
        "ndt_ms_per_iter": None if ndt_ms is None else round(ndt_ms, 4),
        "ndt_final_error": ndt_err,
        "plane_baseline": {
            "ms_per_iter": BASELINE_PLANE_MS_PER_ITER_16384,
            "hardware": "RTX 2060",
            "source": "GPU_ICP_point_to_plane_TimeComp.csv row 16384",
        },
        "baseline": {
            "ms_per_iter": BASELINE_MS_PER_ITER_16384,
            "hardware": "RTX 2060",
            "source": "GPU_ICP_point_to_point_TimeComp.csv row 16384",
        },
    }
    print(json.dumps(details), file=sys.stderr)

    baseline = (BASELINE_PLANE_MS_PER_ITER_16384 if args.metric == "plane"
                else BASELINE_MS_PER_ITER_16384)
    name = ("icp_point_to_plane" if args.metric == "plane"
            else "icp_point_to_point")
    print(json.dumps({
        "metric": f"{name}_ms_per_iter_n{n}",
        "value": round(ms_per_iter, 4),
        "unit": "ms",
        "vs_baseline": round(ms_per_iter / baseline, 4),
    }), flush=True)


def _gate_stage_record(stage: str, rc, note: str = "") -> None:
    """Append one per-stage record to bench_results/gate_log.jsonl the
    moment the stage finishes (VERDICT r4 weak #5: a mid-gate timeout must
    keep the completed stages' evidence on disk)."""
    path = os.path.join(REPO, "bench_results", "gate_log.jsonl")
    rec = {"stage": stage, "rc": rc, "time_unix": round(time.time(), 1),
           "note": note}
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    except OSError as exc:
        _log(f"gate log write failed ({exc})")
    _log(f"gate stage {stage}: rc={rc} {note}")


def _run_gate(args) -> int:
    """Hardware gate (VERDICT r3 #8): smoke -> bench -> artifact refresh.

    Assumes the probe already succeeded. TPU processes are strictly
    serialized (one client per chip). Exit code: nonzero if the smoke or
    the bench failed; artifact refresh failure is reported but non-fatal
    (stale artifacts stay committed and annotated). Each stage's record
    is written to bench_results/gate_log.jsonl as it finishes."""
    rc_total = 0
    smoke = subprocess.run([sys.executable,
                            os.path.join(REPO, "scripts", "tpu_smoke.py")],
                           cwd=REPO)
    _gate_stage_record("tpu_smoke", smoke.returncode)
    rc_total |= (smoke.returncode != 0)
    try:
        measure(args)
        _gate_stage_record("headline_bench", 0)
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        emit_fallback(args, "measurement raised during --smoke gate", 0.0,
                      with_cpu_sanity=not args.cpu, platform="error")
        _gate_stage_record("headline_bench", 2, "measurement raised")
        rc_total |= 2
    report = subprocess.run([sys.executable,
                             os.path.join(REPO, "scripts", "tpu_report.py")],
                            cwd=REPO)
    _gate_stage_record(
        "artifact_refresh", report.returncode,
        "committed artifacts left stale" if report.returncode else "")
    return rc_total


def main() -> int:
    args = _parse_args()
    t0 = time.monotonic()
    if not args.cpu:
        # FIRST action: a provisional record, so an external SIGKILL at any
        # later instant (wedged probe, driver timeout) still leaves a
        # parseable last stdout line. Later prints supersede it.
        print(json.dumps(_fallback_record(
            args, "pending-probe",
            "provisional record printed at startup; superseded by a later "
            "line if this run completes", 0.0)), flush=True)
        if not probe_tpu(args.probe_deadline):
            emit_fallback(args,
                          "TPU backend unreachable after patient probing "
                          "(wedge-discipline retry exhausted)",
                          time.monotonic() - t0)
            # the record IS the successful output: rc 0, parseable JSON
            return 1 if args.smoke else 0
    if args.smoke:
        return _run_gate(args)
    try:
        measure(args)
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        # probe succeeded (or --cpu): a raise here is a code regression,
        # not an unavailable tunnel — report it distinctly (ADVICE r4).
        emit_fallback(args, f"measurement raised: {sys.exc_info()[1]!r}",
                      time.monotonic() - t0,
                      with_cpu_sanity=not args.cpu,
                      platform="error")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
