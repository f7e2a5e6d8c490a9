"""Sanity-check exported COLMAP models under a results root (reference
`scripts/colmap/check_models.py` role).

Usage: python scripts/colmap/check_models.py RESULTS_ROOT
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


import argparse
import json
from pathlib import Path

from flowmap_tpu.evaluation.evaluate import check_model


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_root", type=Path)
    args = parser.parse_args()
    any_bad = False
    for sparse in sorted(args.results_root.glob("**/sparse/0")):
        report = check_model(sparse)
        status = "ok" if report["ok"] else "BAD"
        print(f"{status}  {sparse}  {json.dumps(report)}")
        any_bad |= not report["ok"]
    raise SystemExit(1 if any_bad else 0)


if __name__ == "__main__":
    main()
