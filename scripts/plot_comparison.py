"""Plot new-vs-reference performance curves (the reference's README charts,
reproduced with this framework's numbers) for BOTH metrics and backends.

Reads the reference's committed result CSVs (first-party RTX 2060 / MKL
measurements, data not code) and overlays this framework's sweep output.

Usage:
    python -m fpcr_tpu.cli sweep --metric point --widths 3:128 --csv bench_results/tpu_sweep_point.csv
    python scripts/plot_comparison.py point bench_results/tpu_sweep_point.csv \\
        bench_results/time_complexity_point.png [cpu_sweep.csv]
(the optional trailing CSV adds this framework's CPU-backend curve)
"""

from __future__ import annotations

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REF_CSV_DIR = Path("/root/reference/src/CUDA/csv_files")

REF_FILES = {
    "point": {
        "reference GPU point (RTX 2060)": "GPU_ICP_point_to_point_TimeComp.csv",
        "reference CPU point (MKL)": "CPU_ICP_point_to_point_TimeComp.csv",
    },
    "plane": {
        "reference GPU plane (RTX 2060)": "GPU_ICP_point_to_plane_TimeComp.csv",
        "reference CPU plane (MKL)": "CPU_ICP_point_to_plane_TimeComp.csv",
    },
}


def read_two_col(path: Path):
    ns, ts = [], []
    for line in path.read_text().strip().splitlines():
        a, b = line.split(",")[:2]
        try:
            # parse BOTH before appending either — a row with a numeric
            # first field and junk second field must not desync the lists
            n_v, t_v = int(float(a)), float(b)
        except ValueError:
            continue  # header line (e.g. "NUM_POINTS,TIME") or bad row
        ns.append(n_v)
        ts.append(t_v)
    return ns, ts


def main(metric: str, sweep_csv: str, out_png: str,
         cpu_sweep_csv: str | None = None) -> None:
    fig, ax = plt.subplots(figsize=(8, 5))

    for label, name in REF_FILES[metric].items():
        path = REF_CSV_DIR / name
        if path.exists():
            ns, ts = read_two_col(path)
            ax.plot(ns, ts, "--", label=label, alpha=0.8)

    ns, ts = read_two_col(Path(sweep_csv))
    ax.plot(ns, ts, "-o", markersize=3, label="fpcr_tpu TPU (this framework)")

    if cpu_sweep_csv:
        ns, ts = read_two_col(Path(cpu_sweep_csv))
        ax.plot(ns, ts, "-s", markersize=3, alpha=0.8,
                label="fpcr_tpu CPU backend")

    ax.set_xlabel("points N")
    ax.set_ylabel("ms per ICP iteration")
    ax.set_yscale("log")
    ax.set_title(f"ICP time-complexity ({metric} metric): "
                 "fpcr_tpu vs reference")
    ax.grid(alpha=0.3)
    ax.legend()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=130, bbox_inches="tight")
    print(f"wrote {out_png}")


if __name__ == "__main__":
    if len(sys.argv) not in (4, 5):
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         sys.argv[4] if len(sys.argv) == 5 else None)
