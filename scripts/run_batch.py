"""Batch per-scene runner: the reference's SLURM fanout equivalent.

The reference fans per-scene x per-ablation jobs out to SLURM
(`scripts/run_flowmap.sh` + an unreleased `scripts.run_slurm` helper). Here
scenes run sequentially on the attached TPU (or fan out across hosts by
sharding the scene list on `--shard i/n`).

Usage:
    python scripts/run_batch.py --dataset llff --root datasets/llff \
        --out results/llff [--scenes fern,flower] [--shard 0/1] [overrides...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="llff")
    parser.add_argument("--root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--scenes", default=None)
    parser.add_argument("--shard", default="0/1")
    args, overrides = parser.parse_known_args()

    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.evaluation import evaluate_scene_dir, scene_table
    from flowmap_tpu.overfit import overfit

    root = Path(args.root)
    if args.scenes:
        scenes = args.scenes.split(",")
    else:
        scenes = sorted(p.name for p in root.iterdir() if p.is_dir())
    shard_index, shard_count = (int(x) for x in args.shard.split("/"))
    scenes = scenes[shard_index::shard_count]

    results = []
    for scene in scenes:
        out_dir = Path(args.out) / scene
        cli = [
            f"dataset=[{args.dataset}]",
            f"dataset.{args.dataset}.root={root}",
            f"dataset.{args.dataset}.scene={scene}",
            f"output_dir={out_dir}",
            *overrides,
        ]
        print(f"=== {scene} ===")
        cfg = compose_config("overfit", OverfitCfg, cli)
        try:
            overfit(cfg)
            results.append(evaluate_scene_dir(out_dir))
        except Exception as e:  # keep the batch going, record the failure
            print(f"FAILED {scene}: {e}")
            results.append({"scene": scene, "error": 1.0})

    print(scene_table(results))
    with open(Path(args.out) / "results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
