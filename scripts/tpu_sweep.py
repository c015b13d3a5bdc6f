"""TPU time-complexity sweep at the reference's benchmark sizes, both
metrics — the committed-artifact matrix VERDICT r1 item #3 asks for
(reference CSVs: GPU_ICP_point_to_{point,plane}_TimeComp.csv, WIDTH 3..128).

Remote compiles through the axon tunnel cost 1-10 min per distinct shape, so
this sweeps a representative width ladder instead of all 126 widths (the
CPU-backend sweep covers the full range; curves interpolate smoothly).

Run: python scripts/tpu_sweep.py [--metric point|plane|both]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTHS = (16, 32, 48, 64, 80, 100, 112, 128)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="both",
                    choices=["point", "plane", "both"])
    ap.add_argument("--matcher", default="pallas")
    ap.add_argument("--widths", default=None,
                    help="comma-separated width list")
    args = ap.parse_args()

    from fpcr_tpu.bench.sweeps import time_complexity_sweep

    widths = (tuple(int(w) for w in args.widths.split(","))
              if args.widths else WIDTHS)
    metrics = ["point", "plane"] if args.metric == "both" else [args.metric]
    for metric in metrics:
        csv = f"bench_results/tpu_sweep_{metric}.csv"
        rows = time_complexity_sweep(
            metric=metric, widths=widths, matcher=args.matcher,
            csv_path=csv, slope=True, repeats=3,
        )
        print(f"[{metric}] -> {csv}")
        for n, ms, below_floor in rows:
            flag = " (below noise floor)" if below_floor else ""
            print(f"  {n},{ms:.4f}{flag}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
