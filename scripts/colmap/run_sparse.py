"""COLMAP sparse baseline (reference `scripts/colmap/run_sparse.py:50-63`).

Usage: python scripts/colmap/run_sparse.py INPUT_IMAGES OUTPUT_DIR [--seed N]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


import argparse
from pathlib import Path

from flowmap_tpu.evaluation.colmap_baseline import run_sparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", type=Path)
    parser.add_argument("output_path", type=Path)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--quality", default="extreme")
    parser.add_argument("--data-type", default="video")
    args = parser.parse_args()
    elapsed = run_sparse(
        args.input_path, args.output_path, args.seed, args.quality, args.data_type
    )
    print(f"sparse reconstruction done in {elapsed:.1f}s -> {args.output_path}")


if __name__ == "__main__":
    main()
