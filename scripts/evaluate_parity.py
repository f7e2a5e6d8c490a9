"""One-command real-data ATE parity harness (VERDICT r4 item 5).

Runs the full reference evaluation protocol (`paper/common.py:163-221`) for
one or many scenes in a single command: per-scene overfit initialized from a
(reference or native) checkpoint, using precomputed optical flow, followed by
ATE against a COLMAP pseudo-ground-truth model (matched by image name,
Sim(3)-aligned — `utils/ate.py`), with runtimes reported in minutes exactly
like the reference's tables.

Designed so the day real data (LLFF/T&T scenes + the published
`initialization_finetuned.ckpt` + COLMAP reconstructions) is reachable, the
parity run is ONE execution:

    python scripts/evaluate_parity.py \
        --dataset llff --root datasets/llff \
        --colmap-root results/colmap \
        --checkpoint checkpoints/initialization_finetuned.ckpt \
        --flow-root precomputed_flows/ \
        --out results/flowmap_tpu \
        [--scenes fern,flower] [overrides...]

Per scene it expects:
    <root>/<scene>/...            the scene images (dataset layout)
    <flow-root>/<scene>.npz       precomputed bidirectional flow (optional —
                                  omit --flow-root to compute flow in-process)
    <colmap-root>/<scene>/sparse/0   COLMAP pseudo-GT (optional — without it
                                  only runtime + model checks are reported)

Outputs <out>/parity_table.txt, <out>/parity.json, and the standard per-scene
artifact set (colmap.zip, exports.npz, runtime.json, final_params).

Already-completed scenes (runtime.json present) are evaluated without
re-running unless --force is given, so a crashed sweep resumes for free.
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def scene_list(args) -> list[str]:
    if args.scenes:
        return args.scenes.split(",")
    root = Path(args.root)
    return sorted(p.name for p in root.iterdir() if p.is_dir())


def run_scene(args, scene: str, overrides: list[str]) -> Path:
    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.overfit import overfit

    out_dir = Path(args.out) / scene
    if (out_dir / "runtime.json").exists() and not args.force:
        print(f"[{scene}] already complete, evaluating existing output")
        return out_dir

    if args.dataset == "images":
        # The images dataset has no scene field: <root>/<scene>[/images] IS
        # the image directory.
        scene_root = Path(args.root) / scene
        if (scene_root / "images").is_dir():
            scene_root = scene_root / "images"
        cli = [
            "dataset=[images]",
            f"dataset.images.root={scene_root}",
            f"output_dir={out_dir}",
        ]
    else:
        cli = [
            f"dataset=[{args.dataset}]",
            f"dataset.{args.dataset}.root={args.root}",
            f"dataset.{args.dataset}.scene={scene}",
            f"output_dir={out_dir}",
        ]
    if args.checkpoint:
        cli.append(f"checkpoint.load={args.checkpoint}")
        # Converted reference checkpoints are BN-folded
        # (utils/torch_convert.py) — the model must use the folded graph.
        cli.append("model.backbone.bn=folded")
    if args.flow_root:
        flow_path = Path(args.flow_root) / f"{scene}.npz"
        if not flow_path.exists():
            raise FileNotFoundError(
                f"--flow-root given but {flow_path} is missing "
                f"(produce it with scripts/precompute_flows.py)"
            )
        cli += ["flow=precomputed", f"flow.path={flow_path}"]
    cli += overrides

    cfg = compose_config("overfit", OverfitCfg, cli)
    overfit(cfg)
    return out_dir


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="llff")
    parser.add_argument("--root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--scenes", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--flow-root", default=None)
    parser.add_argument("--colmap-root", default=None,
                        help="per-scene COLMAP pseudo-GT models (ATE target)")
    parser.add_argument("--force", action="store_true",
                        help="re-run scenes that already have outputs")
    args, overrides = parser.parse_known_args()

    from flowmap_tpu.evaluation.evaluate import (
        check_model,
        evaluate_scene_dir,
        scene_table,
    )

    results: list[dict] = []
    for scene in scene_list(args):
        row: dict = {"scene": scene}
        try:
            out_dir = run_scene(args, scene, list(overrides))
            reference_sparse = None
            if args.colmap_root:
                candidate = Path(args.colmap_root) / scene / "sparse/0"
                if not candidate.exists():
                    candidate = Path(args.colmap_root) / scene
                if candidate.exists():
                    reference_sparse = candidate
            metrics = evaluate_scene_dir(
                out_dir, reference_sparse=reference_sparse
            )
            model_check = check_model(
                out_dir / "colmap/sparse/0"
                if (out_dir / "colmap/sparse/0").exists()
                else out_dir / "sparse/0"
            )
            row.update(metrics)
            row["model_ok"] = float(model_check["ok"])
            # Reference tables report runtime in minutes
            # (`paper/common.py:205-209`).
            if "runtime" in row:
                row["runtime_min"] = row.pop("runtime") / 60.0
            row.pop("optimization_runtime", None)
        except Exception:
            print(f"[{scene}] FAILED:\n{traceback.format_exc()}", file=sys.stderr)
            row["model_ok"] = 0.0
        results.append(row)
        print(f"[{scene}] {row}")

    table = scene_table(results)
    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "parity_table.txt").write_text(table + "\n")
    with (out_root / "parity.json").open("w") as fp:
        json.dump(results, fp, indent=2)
    print()
    print(table)


if __name__ == "__main__":
    main()
