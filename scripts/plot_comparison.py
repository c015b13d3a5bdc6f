"""Plot new-vs-reference performance curves (the reference's README charts,
reproduced with this framework's numbers).

Reads the reference's committed result CSVs (first-party RTX 2060 / MKL
measurements, data not code) and overlays this framework's sweep output.

Usage:
    python -m fpcr_tpu.cli sweep --widths 3:128 --csv out/tpu_sweep.csv
    python scripts/plot_comparison.py out/tpu_sweep.csv images/time_complexity.png
"""

from __future__ import annotations

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REF_CSV_DIR = Path("/root/reference/src/CUDA/csv_files")
LOCAL_ASSETS = Path(__file__).resolve().parents[1] / "assets"


def read_two_col(path: Path):
    ns, ts = [], []
    for line in path.read_text().strip().splitlines():
        a, b = line.split(",")[:2]
        try:
            ns.append(int(float(a)))
            ts.append(float(b))
        except ValueError:
            continue  # header line (e.g. "NUM_POINTS,TIME")
    return ns, ts


def main(sweep_csv: str, out_png: str) -> None:
    fig, ax = plt.subplots(figsize=(8, 5))

    ref_files = {
        "reference GPU point (RTX 2060)": "GPU_ICP_point_to_point_TimeComp.csv",
        "reference CPU point (MKL)": "CPU_ICP_point_to_point_TimeComp.csv",
    }
    for label, name in ref_files.items():
        path = REF_CSV_DIR / name
        if path.exists():
            ns, ts = read_two_col(path)
            ax.plot(ns, ts, "--", label=label, alpha=0.8)

    ns, ts = read_two_col(Path(sweep_csv))
    ax.plot(ns, ts, "-o", markersize=3, label="fpcr_tpu (this framework)")

    ax.set_xlabel("points N")
    ax.set_ylabel("ms per ICP iteration")
    ax.set_yscale("log")
    ax.set_title("ICP time-complexity: fpcr_tpu vs reference")
    ax.grid(alpha=0.3)
    ax.legend()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=130, bbox_inches="tight")
    print(f"wrote {out_png}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
