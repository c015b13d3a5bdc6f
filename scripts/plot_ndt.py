"""Plot the NDT lookup-strategy ladder from the committed artifact.

Reads bench_results/ndt_tpu.csv (written by scripts/bench_ndt.py --csv)
and renders ms/iteration vs N for the three voxel-row fetch strategies:
gather (searchsorted + row gather), banded XLA (per-offset contiguous
bands), and the fused direct7 Pallas kernel (ops/ndt_pallas.py).

Usage:
    python scripts/plot_ndt.py [bench_results/ndt_tpu.csv] [out.png]
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

LABELS = {
    ("gather", "auto"): ("gather (searchsorted + row gather)", "#b3b3b3", "o"),
    ("banded", "xla"): ("banded XLA (per-offset bands)", "#5b8dd9", "s"),
    ("banded", "pallas"): ("fused direct7 Pallas kernel", "#d95b43", "D"),
}


def main() -> int:
    csv = Path(sys.argv[1] if len(sys.argv) > 1 else
               "bench_results/ndt_tpu.csv")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else
               "bench_results/ndt_ladder.png")
    series = defaultdict(list)
    for line in csv.read_text().strip().splitlines()[1:]:
        n, lookup, impl, ms = line.split(",")
        series[(lookup, impl)].append((int(n), float(ms)))

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for key, rows in series.items():
        rows.sort()
        label, color, marker = LABELS.get(key, (f"{key}", "k", "x"))
        ax.plot([r[0] for r in rows], [r[1] for r in rows],
                marker=marker, color=color, label=label)
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("points N")
    ax.set_ylabel("ms / NDT Gauss-Newton iteration")
    ax.set_title("NDT voxel-field lookup strategies, TPU v5e "
                 "(direct7, slope-timed)")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
