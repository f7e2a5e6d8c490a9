"""Run COLMAP sparse+dense at FlowMap's working resolution, then rescale the
model metadata back to the original resolution (reference
`scripts/colmap/run_both_at_flowmap_resolution.py:18-94`). This is the
apples-to-apples baseline half of the paper's measurement protocol.

Usage:
  python scripts/colmap/run_both_at_flowmap_resolution.py \
      INPUT_IMAGES OUTPUT_SPARSE OUTPUT_DENSE WORKSPACE [--no-dense]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


import argparse
from pathlib import Path

from flowmap_tpu.config import OverfitCfg, compose_config
from flowmap_tpu.evaluation.colmap_baseline import run_both_at_flowmap_resolution


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", type=Path)
    parser.add_argument("output_sparse_path", type=Path)
    parser.add_argument("output_dense_path", type=Path)
    parser.add_argument("workspace_path", type=Path)
    parser.add_argument("--no-dense", action="store_true")
    args = parser.parse_args()

    # The cropping config comes from the shipped overfit config, exactly as
    # the reference loads `config/overfit.yaml`'s cropping block.
    cfg = compose_config("overfit", OverfitCfg, [])
    run_both_at_flowmap_resolution(
        args.input_path,
        args.output_sparse_path,
        args.output_dense_path,
        args.workspace_path,
        cfg.cropping,
        dense=not args.no_dense,
    )
    print(f"done -> {args.output_sparse_path}")


if __name__ == "__main__":
    main()
