"""Batch per-scene runner: the reference's SLURM fanout equivalent.

The reference fans per-scene x per-ablation jobs out to SLURM
(`scripts/run_flowmap.sh` + an unreleased `scripts.run_slurm` helper). This
runner supports three modes:

- sequential on the attached TPU (default),
- manual fanout across hosts by sharding the scene list (`--shard i/n`),
- SLURM array-job submission (`--slurm`): one array task per
  scene x experiment, emitted as an sbatch script and submitted via
  `sbatch` (or just written with `--dry-run`).

Usage:
    python scripts/run_batch.py --dataset llff --root datasets/llff \
        --out results/llff [--scenes fern,flower] [--experiments e1,e2] \
        [--shard 0/1] [--slurm [--slurm-args "--partition=tpu"] [--dry-run]] \
        [overrides...]
"""

from __future__ import annotations

import argparse
import json
import shlex
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def list_jobs(args) -> list[tuple[str, str | None]]:
    """(scene, experiment) pairs — the reference's per-scene x per-ablation
    grid (`scripts/run_flowmap.sh`)."""
    root = Path(args.root)
    if args.scenes:
        scenes = args.scenes.split(",")
    else:
        scenes = sorted(p.name for p in root.iterdir() if p.is_dir())
    shard_index, shard_count = (int(x) for x in args.shard.split("/"))
    scenes = scenes[shard_index::shard_count]
    experiments = args.experiments.split(",") if args.experiments else [None]
    return [(scene, exp) for exp in experiments for scene in scenes]


def job_out_dir(args, scene: str, experiment: str | None) -> Path:
    out = Path(args.out)
    return (out / experiment / scene) if experiment else (out / scene)


def job_cli(args, scene: str, experiment: str | None, overrides) -> list[str]:
    cli = [
        f"dataset=[{args.dataset}]",
        f"dataset.{args.dataset}.root={args.root}",
        f"dataset.{args.dataset}.scene={scene}",
        f"output_dir={job_out_dir(args, scene, experiment)}",
    ]
    if experiment:
        cli.append(f"+experiment={experiment}")
    return cli + list(overrides)


def write_sbatch(args, jobs, overrides) -> Path:
    """Emit one sbatch array script: task i runs job i."""
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    lines = [
        "#!/bin/bash",
        f"#SBATCH --job-name=flowmap-{Path(args.root).name}",
        f"#SBATCH --array=0-{len(jobs) - 1}",
        f"#SBATCH --output={out}/slurm_%a.log",
        "",
        "case $SLURM_ARRAY_TASK_ID in",
    ]
    for i, (scene, experiment) in enumerate(jobs):
        cmd = [
            sys.executable,
            "-m",
            "flowmap_tpu.overfit",
            *job_cli(args, scene, experiment, overrides),
        ]
        lines.append(f"{i}) {shlex.join(cmd)} ;;")
    lines += ["esac", ""]
    script = out / "submit.sbatch"
    script.write_text("\n".join(lines))
    return script


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="llff")
    parser.add_argument("--root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--scenes", default=None)
    parser.add_argument(
        "--experiments",
        default=None,
        help="comma-separated +experiment= names crossed with scenes",
    )
    parser.add_argument("--shard", default="0/1")
    parser.add_argument("--slurm", action="store_true")
    parser.add_argument("--slurm-args", default="")
    parser.add_argument("--dry-run", action="store_true")
    args, overrides = parser.parse_known_args()

    jobs = list_jobs(args)

    if args.slurm:
        script = write_sbatch(args, jobs, overrides)
        print(f"wrote {script} ({len(jobs)} array tasks)")
        submit = ["sbatch", *shlex.split(args.slurm_args), str(script)]
        if args.dry_run:
            print(f"dry-run; submit with: {shlex.join(submit)}")
        elif shutil.which("sbatch") is None:
            print(f"sbatch not found; submit manually: {shlex.join(submit)}")
        else:
            subprocess.run(submit, check=True)
        return

    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.evaluation import evaluate_scene_dir, scene_table
    from flowmap_tpu.overfit import overfit

    results = []
    for scene, experiment in jobs:
        out_dir = job_out_dir(args, scene, experiment)
        cli = job_cli(args, scene, experiment, overrides)
        print(f"=== {scene}" + (f" (+{experiment})" if experiment else "") + " ===")
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
