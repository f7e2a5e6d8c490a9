"""Generate the baseline-comparison LaTeX table over a results root
(reference `paper/generate_baseline_comparison_table.py:48-100` +
`paper/common.py:163-238`).

Usage:
  python scripts/paper/generate_tables.py RESULTS_ROOT [--datasets llff tandt]
      [--metrics-root DIR] [--metrics-prefix paper_v17_] [-o tables/]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


import argparse
from pathlib import Path

from flowmap_tpu.evaluation.tables import (
    METHOD_COLMAP,
    METHOD_FLOWMAP,
    METHOD_MVSCOLMAP,
    generate_comparison_table,
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_root", type=Path)
    parser.add_argument(
        "--datasets", nargs="+", default=["llff", "mipnerf360", "tandt", "co3d"]
    )
    parser.add_argument("--metrics-root", type=Path, default=None)
    parser.add_argument("--metrics-prefix", default="")
    parser.add_argument("-o", "--output", type=Path, default=None)
    args = parser.parse_args()

    table = generate_comparison_table(
        args.results_root,
        methods=(METHOD_FLOWMAP, METHOD_COLMAP, METHOD_MVSCOLMAP),
        datasets=args.datasets,
        metrics_root=args.metrics_root,
        metrics_prefix=args.metrics_prefix,
    )
    if args.output is not None:
        args.output.mkdir(exist_ok=True, parents=True)
        (args.output / "baseline_comparison.tex").write_text(table + "\n")
        print(f"wrote {args.output / 'baseline_comparison.tex'}")
    else:
        print(table)


if __name__ == "__main__":
    main()
