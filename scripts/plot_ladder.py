"""Matching-kernel ladder chart: this framework's variants vs the
reference's committed CUDA µbench results (Matching*.csv, min-of-10 on an
RTX 2060 — data not code). Reads bench_results/match_ladder_tpu.csv
(written by scripts/tpu_report.py / `cli match-bench`).

Run: python scripts/plot_ladder.py [ladder_csv] [out_png]
"""

from __future__ import annotations

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REF = [  # (label, ms) — reference's committed Matching*.csv @ N=M=16,384
    ("ref CUDA original (sqrt+pow)", 5.977),
    ("ref CUDA no-sqrt", 4.100),
    ("ref CUDA registers", 2.359),
    ("ref CUDA split-loop (best)", 2.297),
]

LABELS = {
    "xla": "fpcr XLA matmul-form",
    "xla_exact": "fpcr XLA exact-form",
    "pallas": "fpcr Pallas (default)",
    "pallas_highest": "fpcr Pallas HIGHEST (bit-exact f32)",
    "pallas_packed6": "fpcr Pallas K-packed bf16x6",
    "morton": "fpcr Morton band (near-registered)",
}


def main(csv_path: str, out_png: str) -> None:
    rows = []
    for line in Path(csv_path).read_text().strip().splitlines():
        parts = line.split(",")
        if parts[0] == "variant":
            continue
        rows.append((LABELS.get(parts[0], parts[0]), float(parts[2])))

    labels = [r[0] for r in REF] + [r[0] for r in rows]
    values = [r[1] for r in REF] + [r[1] for r in rows]
    colors = (["#b0b0b0"] * len(REF)) + (["#3b78c3"] * len(rows))

    fig, ax = plt.subplots(figsize=(9, 0.45 * len(labels) + 1.5))
    y = range(len(labels))
    ax.barh(y, values, color=colors)
    ax.set_yticks(list(y))
    ax.set_yticklabels(labels, fontsize=9)
    ax.invert_yaxis()
    ax.set_xlabel("ms per matching pass, N = M = 16,384 (log scale)")
    ax.set_xscale("log")
    for yi, v in zip(y, values):
        ax.text(v * 1.05, yi, f"{v:.2f}", va="center", fontsize=8)
    ax.set_title("NN matching kernel ladder: fpcr_tpu (TPU v5e) vs "
                 "reference (RTX 2060)")
    ax.grid(alpha=0.3, axis="x")
    fig.savefig(out_png, dpi=130, bbox_inches="tight")
    print(f"wrote {out_png}")


if __name__ == "__main__":
    csv = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/bench_results/match_ladder_tpu.csv"
    png = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/bench_results/matching_ladder.png"
    main(csv, png)
