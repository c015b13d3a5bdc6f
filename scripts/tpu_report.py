"""One-shot TPU performance report: runs the reference-comparable sweeps and
microbenches on the real chip, writes CSVs + plots into bench_results/.

Run (holds the TPU for several minutes):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_report.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import fpcr_tpu as f  # noqa: E402

OUT = Path("/root/repo/bench_results")


def sync(x):
    return float(np.asarray(x).ravel()[0])


def slope_icp(width, matcher, lo=5, hi=25, repeats=3, metric="point",
              **cfg_kw):
    scene = f.synthetic_scene(width=width)
    gt = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    src = jax.device_put(scene.source)
    tgt = jax.device_put(gt.apply(scene.source))
    eps = np.float32(1e-7)

    def make(iters):
        cfg = f.ICPConfig(metric=metric, matcher=matcher, max_iterations=iters,
                          tolerance=0.0, **cfg_kw)
        def run(s, t):
            return f.run_icp(s, t, cfg)
        sync(run(src, tgt).errors[-1:])
        return run

    def timed(fn):
        ts = []
        for k in range(repeats):
            s = src + eps * (k + 1)
            t = tgt + eps * (k + 1)
            sync(s[:1, :1]); sync(t[:1, :1])
            t0 = time.perf_counter()
            out = fn(s, t)
            sync(out.errors[-1:])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(make(lo)), timed(make(hi))
    return (t_hi - t_lo) * 1e3 / (hi - lo)


def main():
    OUT.mkdir(exist_ok=True)
    report = {"platform": jax.devices()[0].platform}

    # 1) time-complexity sweep (subset of the reference's width ladder; the
    # reference's own CSV rows at 1024/4096/10000/16384 are the comparison)
    sweep = []
    for width in (16, 32, 64, 100, 128):
        ms = slope_icp(width, "xla")
        sweep.append((width * width, ms))
        print(f"sweep point N={width*width}: {ms:.3f} ms/iter", flush=True)
    Path(OUT / "tpu_sweep_point.csv").write_text(
        "\n".join(f"{n},{ms:.6f}" for n, ms in sweep) + "\n")
    report["sweep_point"] = sweep

    # plane-metric at the headline size
    report["plane_16384_ms"] = slope_icp(128, "xla", metric="plane")
    print(f"plane 16384: {report['plane_16384_ms']:.3f} ms/iter", flush=True)

    # 2) matcher ladder at 16,384 (the reference's Matching µbench analog)
    ladder = {}
    for matcher in ("xla", "pallas", "morton"):
        ladder[matcher] = slope_icp(128, matcher)
        print(f"ladder {matcher}: {ladder[matcher]:.3f} ms/iter", flush=True)
    report["icp_ladder_16384"] = ladder

    # 3) large-N morton scaling (tuned packed6 band config, BENCH_NOTES)
    large = {}
    for width in (512, 1024):
        large[width * width] = slope_icp(width, "morton", morton_window=64,
                                         morton_chunk=512, morton_unroll=8,
                                         source_chunk=2048)
        print(f"large morton N={width*width}: {large[width*width]:.3f} ms/iter",
              flush=True)
    report["morton_scaling"] = large

    # 4) end-to-end dataset workloads (the reference's program inventory)
    import fpcr_tpu.data.bunny as bunny
    import fpcr_tpu.data.ouster as ouster

    e2e = {}
    for name, scene, metric, iters in (
        ("bunny_point", bunny.bunny_scene(), "point", 40),
        ("bunny_plane", bunny.bunny_scene(), "plane", 40),
        ("hall_plane", ouster.hall_scene(), "plane", 100),
    ):
        cfg = f.ICPConfig(metric=metric, max_iterations=iters)
        res = f.run_icp(scene.source, scene.target, cfg)  # compile+run
        t0 = time.perf_counter()
        res = f.run_icp(scene.source + np.float32(1e-7),
                        scene.target + np.float32(1e-7), cfg)
        sync(res.errors[-1:])
        wall = time.perf_counter() - t0
        rmse = float(f.transform_rmse(res.transform, scene.ground_truth,
                                      scene.source))
        e2e[name] = {"wall_s": wall, "iters": int(res.num_iterations),
                     "transform_rmse_vs_gt": rmse}
        print(f"e2e {name}: {wall:.3f}s {int(res.num_iterations)} iters "
              f"rmse {rmse:.2e}", flush=True)
    report["end_to_end"] = e2e

    (OUT / "tpu_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)

    # 5) comparison plot
    try:
        import subprocess
        subprocess.run([sys.executable, "/root/repo/scripts/plot_comparison.py",
                        "point",
                        str(OUT / "tpu_sweep_point.csv"),
                        str(OUT / "time_complexity.png")], check=True)
    except Exception as exc:
        print(f"plot skipped: {exc}", flush=True)


if __name__ == "__main__":
    main()
