"""Isometric point-cloud + camera-frustum render from an exported model
(reference: paper/render_point_cloud.py — the SVG/Figma-specific bits are
replaced by a PNG canvas; projection, depth ordering, and frustum wireframes
match).

Usage (from an overfit output directory):
    python -m scripts.paper.render_point_cloud \
        --exports outputs/scene/exports.npz --out figures/scene_cloud.png
or from a COLMAP export (uses points3D + camera poses):
    python -m scripts.paper.render_point_cloud \
        --model outputs/scene/colmap/sparse/0 --out figures/scene_cloud.png
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from flowmap_tpu.evaluation.figures import (
    PointCloudRenderCfg,
    render_point_cloud,
    unproject_exports,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--exports", type=Path)
    parser.add_argument("--model", type=Path, help="COLMAP sparse model dir")
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--canvas", type=int, default=1024)
    parser.add_argument("--scale", type=float, default=150.0)
    parser.add_argument("--max-points", type=int, default=20000)
    args = parser.parse_args()

    if args.exports is not None:
        data = np.load(args.exports)
        extrinsics = data["extrinsics"][0]
        intrinsics = data["intrinsics"][0]
        xyz, rgb = unproject_exports(
            data["depths"], data["intrinsics"], data["extrinsics"]
        )
    elif args.model is not None:
        from flowmap_tpu.export.colmap import read_colmap_model
        from flowmap_tpu.export.colmap_io import read_points3d_binary

        extrinsics, intrinsics, _ = read_colmap_model(args.model)
        points = read_points3d_binary(Path(args.model) / "points3D.bin")
        xyz = np.stack([p.xyz for p in points.values()])
        rgb = np.stack([p.rgb for p in points.values()]) / 255.0
    else:
        raise SystemExit("pass --exports or --model")

    cfg = PointCloudRenderCfg(
        canvas_size=args.canvas, scale=args.scale, max_points=args.max_points
    )
    image = render_point_cloud(xyz, rgb, extrinsics, intrinsics, cfg)

    from PIL import Image

    args.out.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(
        (image.transpose(1, 2, 0) * 255).astype(np.uint8)
    ).save(args.out)
    print(f"wrote {args.out} ({xyz.shape[0]} points)")


if __name__ == "__main__":
    main()
