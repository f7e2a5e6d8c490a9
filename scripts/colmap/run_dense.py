"""COLMAP dense MVS baseline (reference `scripts/colmap/run_dense.py:59-72`).

Usage: python scripts/colmap/run_dense.py SPARSE_DIR OUTPUT_DIR
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


import argparse
from pathlib import Path

from flowmap_tpu.evaluation.colmap_baseline import run_dense


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", type=Path)
    parser.add_argument("output_path", type=Path)
    args = parser.parse_args()
    elapsed = run_dense(args.input_path, args.output_path)
    print(f"dense reconstruction done in {elapsed:.1f}s -> {args.output_path}")


if __name__ == "__main__":
    main()
