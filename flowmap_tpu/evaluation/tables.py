"""Paper-table generation: ranked LaTeX comparison tables over results dirs.

Parity target: the reference's `paper/table.py` (round-to-precision ranking,
first/second/third highlighting, multi-headers) and
`paper/generate_baseline_comparison_table.py` /
`paper/generate_ablation_table.py` (per-dataset metric means over the
canonical scene lists, runtime from results dirs, ATE vs the COLMAP
pseudo-ground-truth reconstruction — `paper/common.py:163-238`).

Results-directory contract (same as the reference's RESULTS_PATH layout):
    <results_root>/<method_tag>/<scene_tag>/sparse/0/   COLMAP model
    <results_root>/<method_tag>/<scene_tag>/runtime.json
Optional NVS metrics (produced by an external splatting pipeline there and
here): <metrics_root>/<prefix><method_tag>_<scene_tag>/metrics.json.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Literal, Optional, Sequence

import numpy as np

from .evaluate import EVAL_SCENES, evaluate_against_colmap


@dataclass(frozen=True)
class Method:
    tag: str
    full_name: str


@dataclass(frozen=True)
class Metric:
    tag: str
    full_name: str
    order: Literal[-1, 0, 1]  # 1 higher-better, -1 lower-better, 0 unranked
    precision: int = 2


METRIC_PSNR = Metric("psnr", "PSNR", 1, 2)
METRIC_SSIM = Metric("ssim", "SSIM", 1, 3)
METRIC_LPIPS = Metric("lpips", "LPIPS", -1, 3)
METRIC_RUNTIME = Metric("runtime", "Time (min.)", -1, 1)
METRIC_COLMAP_ATE = Metric("ate", "ATE", 0, 3)

METHOD_FLOWMAP = Method("flowmap", "FlowMap (TPU)")
METHOD_COLMAP = Method("colmap", "COLMAP")
METHOD_MVSCOLMAP = Method("mvscolmap", "COLMAP (MVS)")


def round_values(values: np.ndarray, precisions: np.ndarray) -> np.ndarray:
    """Quantize each column to its display precision so ties in the rendered
    table rank as ties (`paper/table.py:10-21`)."""
    quantized = np.zeros_like(values)
    for precision in np.unique(precisions):
        mask = np.broadcast_to(precisions == precision, values.shape)
        quantized[mask] = np.round(values[mask], int(precision))
    return quantized


def compute_ranks_for_column(
    values: np.ndarray, order: Literal[-1, 0, 1]
) -> np.ndarray:
    """Dense ranks of one column; NaN ranks last (`paper/table.py:24-46`)."""
    if order == 0:
        return np.full(values.shape, 10**5, dtype=np.int32)
    values = np.copy(values)
    values[np.isnan(values)] = -order * np.inf
    ranked_unique = np.sort(np.unique(values))
    if order == 1:
        ranked_unique = ranked_unique[::-1]
    ranks = np.zeros_like(values, dtype=np.int32)
    for rank, value in enumerate(ranked_unique):
        ranks[values == value] = rank
    return ranks


def make_latex_table(
    results: dict[str, list[Optional[float]]],
    metrics: Sequence[str],
    precisions: Sequence[int],
    rank_orders: Sequence[Literal[-1, 0, 1]],
    none_str: str = "N/A",
    multi_headers: Optional[Iterable[tuple[str, int]]] = None,
) -> str:
    """Aligned LaTeX rows with \\first/\\second/\\third rank highlighting and
    up/down arrows on metric names (`paper/table.py:63-160`)."""
    data = np.array(
        [
            [math.nan if v is None else float(v) for v in row]
            for row in results.values()
        ],
        dtype=np.float64,
    )
    data_rounded = round_values(data, np.array(precisions))
    ranks = np.stack(
        [
            compute_ranks_for_column(data_rounded[:, col], rank_orders[col])
            for col in range(data.shape[1])
        ],
        axis=1,
    )

    rank_fns = (
        lambda x: f"\\first{{{x}}}",
        lambda x: f"\\second{{{x}}}",
        lambda x: f"\\third{{{x}}}",
        lambda x: x,
    )
    arrows = {0: "", 1: " $\\uparrow$", -1: " $\\downarrow$"}
    headers = [
        f"{name}{arrows[order]}" for name, order in zip(metrics, rank_orders)
    ]

    cells = [["Method", *headers]]
    for row, (method_name, row_values) in enumerate(results.items()):
        rendered = []
        for col, value in enumerate(row_values):
            text = (
                none_str
                if value is None or (isinstance(value, float) and math.isnan(value))
                else f"{value:.{precisions[col]}f}"
            )
            fn = rank_fns[min(int(ranks[row, col]), len(rank_fns) - 1)]
            rendered.append(fn(text))
        cells.append([method_name, *rendered])

    widths = [max(len(row[col]) for row in cells) for col in range(len(cells[0]))]
    body = []
    for r, row in enumerate(cells):
        padded = [
            (cell.rjust if r > 0 and c > 0 else cell.ljust)(widths[c])
            for c, cell in enumerate(row)
        ]
        body.append(" & ".join(padded) + " \\\\")

    lines = []
    if multi_headers is not None:
        multi_headers = list(multi_headers)
        columns = [
            f"\\multicolumn{{{span}}}"
            f"{{{'|c|' if i < len(multi_headers) - 1 else '|c'}}}{{{text}}}"
            for i, (text, span) in enumerate(multi_headers)
        ]
        lines.append(" & ".join(("\\multicolumn{1}{c|}{}", *columns)) + " \\\\")
    lines.extend(body)
    return "\n".join(lines)


def load_scene_metrics(
    results_root: Path,
    method: Method,
    scene_tag: str,
    metrics_root: Optional[Path] = None,
    metrics_prefix: str = "",
    colmap_gt_method: Method = METHOD_COLMAP,
    want_ate: bool = True,
) -> dict[str, float]:
    """One scene's metrics dict, mirroring `paper/common.py:170-238`:
    metrics.json (NVS numbers) if present, runtime.json from the results dir
    (converted to minutes), and ATE vs the COLMAP pseudo-GT reconstruction."""
    results_root = Path(results_root)
    scene_metrics: dict[str, float] = {}

    if metrics_root is not None:
        metrics_file = (
            Path(metrics_root)
            / f"{metrics_prefix}{method.tag}_{scene_tag}/metrics.json"
        )
        if metrics_file.exists():
            scene_metrics.update(json.loads(metrics_file.read_text()))

    runtime_file = results_root / method.tag / scene_tag / "runtime.json"
    if runtime_file.exists():
        scene_metrics["runtime"] = (
            json.loads(runtime_file.read_text())["runtime"] / 60
        )

    if want_ate and method.tag not in (METHOD_COLMAP.tag, METHOD_MVSCOLMAP.tag):
        pred = results_root / method.tag / scene_tag / "sparse/0"
        gt = results_root / colmap_gt_method.tag / scene_tag / "sparse/0"
        if pred.exists() and gt.exists():
            scene_metrics["ate"] = evaluate_against_colmap(pred, gt)["ate"]

    return scene_metrics


def dataset_means(
    results_root: Path,
    methods: Sequence[Method],
    datasets: Sequence[str],
    metrics: Sequence[Metric],
    metrics_root: Optional[Path] = None,
    metrics_prefix: str = "",
) -> dict[str, list[Optional[float]]]:
    """Per-method rows of per-dataset metric means over the canonical scene
    lists (`generate_baseline_comparison_table.py:48-76`). Row layout is
    [dataset0 metric0, dataset0 metric1, ..., dataset1 metric0, ...]."""
    rows: dict[str, list[Optional[float]]] = {}
    for method in methods:
        row: list[Optional[float]] = []
        for dataset in datasets:
            per_metric: dict[str, list[float]] = {m.tag: [] for m in metrics}
            for scene in EVAL_SCENES[dataset]:
                scene_tag = f"{dataset}_{scene}"
                found = load_scene_metrics(
                    results_root,
                    method,
                    scene_tag,
                    metrics_root,
                    metrics_prefix,
                    want_ate=any(m.tag == "ate" for m in metrics),
                )
                for m in metrics:
                    if m.tag in found and found[m.tag] is not None:
                        value = float(found[m.tag])
                        if not math.isnan(value):
                            per_metric[m.tag].append(value)
            for m in metrics:
                values = per_metric[m.tag]
                row.append(float(np.mean(values)) if values else None)
        rows[method.full_name] = row
    return rows


def generate_comparison_table(
    results_root: Path,
    methods: Sequence[Method] = (METHOD_FLOWMAP, METHOD_COLMAP, METHOD_MVSCOLMAP),
    datasets: Sequence[str] = ("llff", "mipnerf360", "tandt", "co3d"),
    metrics: Sequence[Metric] = (METRIC_RUNTIME, METRIC_COLMAP_ATE),
    metrics_root: Optional[Path] = None,
    metrics_prefix: str = "",
) -> str:
    """The baseline-comparison LaTeX table over a results root."""
    rows = dataset_means(
        results_root, methods, datasets, metrics, metrics_root, metrics_prefix
    )
    n = len(metrics)
    return make_latex_table(
        rows,
        metrics=[m.full_name for m in metrics] * len(datasets),
        precisions=[m.precision for m in metrics] * len(datasets),
        rank_orders=[m.order for m in metrics] * len(datasets),
        multi_headers=[(d, n) for d in datasets],
    )
