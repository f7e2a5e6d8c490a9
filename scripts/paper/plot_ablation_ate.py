"""ATE-vs-step ablation plot (reference: paper/plot_ablation_ate.py).

Usage:
    python -m scripts.paper.plot_ablation_ate \
        --ates outputs/ates --out figures/ablation_ate_plot.svg

`--ates` points at a directory whose entries are either `<method>.json`
(a JSON list of per-validation-step ATEs) or `<method>/` directories of
per-step `ate_XXXXXX.json` dumps written by the `+experiment=dump_ate`
config (`flowmap_tpu/visualization/visualizers.py`).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from flowmap_tpu.evaluation.figures import load_ate_series, plot_ate_curves

# Reference method colors (paper/colors.py conventions).
DEFAULT_COLORS = {
    "flowmap": "#E6194B",
    "ablation_explicit_depth": "#4363D8",
    "ablation_explicit_pose": "#3CB44B",
    "ablation_explicit_focal_length": "#F58231",
    "ablation_single_stage": "#911EB4",
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ates", type=Path, required=True)
    parser.add_argument(
        "--out", type=Path, default=Path("figures/ablation_ate_plot.svg")
    )
    parser.add_argument("--max-steps", type=int, default=2000)
    args = parser.parse_args()

    curves = {}
    for entry in sorted(Path(args.ates).iterdir()):
        if entry.is_dir() or entry.suffix == ".json":
            name = entry.stem if entry.is_file() else entry.name
            series = load_ate_series(entry)
            if series:
                curves[name] = series
    if not curves:
        raise SystemExit(f"no ATE series found under {args.ates}")
    plot_ate_curves(curves, args.out, DEFAULT_COLORS, args.max_steps)
    print(f"wrote {args.out} ({len(curves)} curves)")


if __name__ == "__main__":
    main()
