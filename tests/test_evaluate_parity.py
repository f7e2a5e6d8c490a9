"""E2E test of the one-command parity harness (scripts/evaluate_parity.py):
synthetic scene + precomputed flow + Lightning checkpoint fixture + a COLMAP
pseudo-ground-truth model -> per-scene ATE/runtime parity table, exactly the
reference protocol (`paper/common.py:163-221`) as one command."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.lightning_ckpt_fixture import make_reference_lightning_ckpt


def test_parity_harness_end_to_end(tmp_path):
    from PIL import Image

    from flowmap_tpu.export import export_to_colmap
    from flowmap_tpu.flow.predictors import save_flows
    from flowmap_tpu.types import ModelExports
    from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene

    scene = "toy0"
    h, w, f = 64, 96, 6
    batch, flows, gt_depths = make_scene(
        SyntheticSceneCfg(num_frames=f, image_shape=(h, w))
    )

    # Dataset layout: <root>/<scene>/images/*.png
    images_dir = tmp_path / "data" / scene / "images"
    images_dir.mkdir(parents=True)
    frame_paths = []
    for i, frame in enumerate(np.asarray(batch.videos[0])):
        arr = (frame.transpose(1, 2, 0) * 255).astype(np.uint8)
        frame_path = images_dir / f"{i:0>6}.png"
        Image.fromarray(arr).save(frame_path)
        frame_paths.append(frame_path)

    # Precomputed flow: <flow_root>/<scene>.npz
    flow_root = tmp_path / "flows"
    flow_root.mkdir()
    save_flows(flow_root / f"{scene}.npz", flows)

    # COLMAP pseudo-ground-truth from the synthetic GT poses, written with
    # the same image names so the harness can match frames.
    gt_dir = tmp_path / "colmap_gt" / scene
    export_to_colmap(
        ModelExports(
            extrinsics=batch.extrinsics,
            intrinsics=batch.intrinsics,
            colors=batch.videos,
            depths=gt_depths,
        ),
        frame_paths,
        (h, w),
        (h, w),
        gt_dir,
    )

    ckpt = tmp_path / "init.ckpt"
    make_reference_lightning_ckpt(ckpt)

    out_root = tmp_path / "results"
    cmd = [
        sys.executable,
        "scripts/evaluate_parity.py",
        "--dataset", "images",
        "--root", str(tmp_path / "data"),
        "--out", str(out_root),
        "--checkpoint", str(ckpt),
        "--flow-root", str(flow_root),
        "--colmap-root", str(tmp_path / "colmap_gt"),
        # toy-scale overrides (same dotted syntax as the CLI)
        "model.backbone.pretrained=false",
        "model.backbone.mapping=exp",
        "model.intrinsics.num_procrustes_points=512",
        "model.intrinsics.num_candidates=12",
        "model.extrinsics.num_points=128",
        "loss=[flow]",
        "trainer.max_steps=4",
        "trainer.val_check_interval=2",
        f"cropping.image_shape=[{h},{w}]",
        "cropping.patch_size=32",
        "cropping.flow_scale_multiplier=1",
    ]
    proc = subprocess.run(
        cmd,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    table = (out_root / "parity_table.txt").read_text()
    assert scene in table and "mean" in table

    results = json.loads((out_root / "parity.json").read_text())
    assert len(results) == 1
    row = results[0]
    assert row["scene"] == scene
    assert row["model_ok"] == 1.0
    assert row["matched_frames_vs_colmap"] == f
    assert np.isfinite(row["ate_vs_colmap"])
    assert row["runtime_min"] > 0

    # Resume path: a second invocation must evaluate without re-running.
    proc2 = subprocess.run(
        cmd,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    assert "already complete" in proc2.stdout
