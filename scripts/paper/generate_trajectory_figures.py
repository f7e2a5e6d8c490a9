"""Aligned 3D trajectory figures per scene (reference:
paper/generate_trajectory_plots.py).

Usage:
    python -m scripts.paper.generate_trajectory_figures \
        --source COLMAP=/results/colmap --source FlowMap=/results/flowmap \
        --scenes llff_fern llff_flower --out figures/

Each source root contains `<scene>/sparse/0` COLMAP models (the layout this
repo's `export_to_colmap` + run_batch produce). The first source is the
alignment target and draws dashed.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from flowmap_tpu.evaluation.figures import (
    camera_centers_from_model,
    plot_trajectories,
)

DEFAULT_COLORS = {"COLMAP": "#000000", "FlowMap": "#E6194B"}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--source", action="append", required=True,
        help="name=path, repeatable; first is the alignment target",
    )
    parser.add_argument("--scenes", nargs="+", required=True)
    parser.add_argument("--out", type=Path, default=Path("figures"))
    parser.add_argument("--flip", action="store_true")
    args = parser.parse_args()

    sources = [s.split("=", 1) for s in args.source]
    for scene in args.scenes:
        trajectories = {}
        for name, root in sources:
            model_dir = Path(root) / scene / "sparse" / "0"
            if not model_dir.exists():
                model_dir = Path(root) / scene  # bare model dir
            try:
                trajectories[name] = camera_centers_from_model(model_dir)
            except FileNotFoundError:
                print(f"skip {name}/{scene}: no model at {model_dir}")
        if not trajectories:
            continue
        out = args.out / f"trajectory_{scene}.svg"
        plot_trajectories(trajectories, out, DEFAULT_COLORS, flip=args.flip)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
