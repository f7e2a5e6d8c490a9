"""COLMAP baseline protocol + paper-table tooling.

Covers the resize/metadata-rescale half of the reference's
`scripts/colmap/run_both_at_flowmap_resolution.py:23-94` protocol (pure
Python, no colmap binary needed), the subprocess drivers against a fake
`colmap` binary, and `paper/table.py`-parity LaTeX table generation.
"""

import json
import os
import stat
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from flowmap_tpu.evaluation.colmap_baseline import (
    colmap_available,
    flowmap_flow_resolution,
    rescale_model_metadata,
    resize_images_for_flowmap,
    run_sparse,
)
from flowmap_tpu.evaluation.tables import (
    METRIC_COLMAP_ATE,
    METRIC_RUNTIME,
    Method,
    compute_ranks_for_column,
    dataset_means,
    generate_comparison_table,
    make_latex_table,
    round_values,
)
from flowmap_tpu.export.colmap import read_colmap_model, write_colmap_model
from flowmap_tpu.utils.cropping import CroppingCfg


def _write_synthetic_model(path: Path, num_frames: int, shape: tuple[int, int]):
    rng = np.random.default_rng(0)
    extrinsics = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    extrinsics[:, :3, 3] = rng.normal(size=(num_frames, 3)).astype(np.float32)
    intrinsics = np.tile(np.eye(3, dtype=np.float32), (num_frames, 1, 1))
    intrinsics[:, 0, 0] = 0.9
    intrinsics[:, 1, 1] = 1.2
    intrinsics[:, 0, 2] = 0.5
    intrinsics[:, 1, 2] = 0.5
    names = [f"{i:06d}.png" for i in range(num_frames)]
    path.mkdir(parents=True, exist_ok=True)
    write_colmap_model(path, extrinsics, intrinsics, names, shape)
    return extrinsics, intrinsics, names


def test_flowmap_flow_resolution():
    # Pixel-budget config: area ~ image_shape, scaled by the multiplier —
    # `run_both_at_flowmap_resolution.py:43-46`.
    cfg = CroppingCfg(image_shape=43200, flow_scale_multiplier=4, patch_size=32)
    h, w = flowmap_flow_resolution((1080, 1920), cfg)
    assert (h, w) == (4 * 156, 4 * 277)
    cfg_exact = CroppingCfg(
        image_shape=(160, 224), flow_scale_multiplier=2, patch_size=16
    )
    assert flowmap_flow_resolution((999, 999), cfg_exact) == (320, 448)


def test_resize_images_for_flowmap(tmp_path):
    src = tmp_path / "images"
    src.mkdir()
    for i in range(3):
        Image.fromarray(
            np.full((96, 128, 3), i * 40, dtype=np.uint8)
        ).save(src / f"{i:06d}.png")
    cfg = CroppingCfg(image_shape=(48, 64), flow_scale_multiplier=2, patch_size=8)
    original = resize_images_for_flowmap(src, tmp_path / "resized", cfg)
    assert original == (96, 128)
    resized = Image.open(tmp_path / "resized/000000.png")
    assert (resized.height, resized.width) == (96, 128)


def test_rescale_model_metadata_round_trip(tmp_path):
    """Writing at flow resolution then rescaling to the original resolution
    must leave normalized intrinsics and extrinsics unchanged while updating
    the stored pixel dimensions, and must preserve points3D bytes
    (`run_both_at_flowmap_resolution.py:58-79`)."""
    sparse = tmp_path / "sparse/0"
    extrinsics, intrinsics, names = _write_synthetic_model(sparse, 5, (96, 128))
    fake_points = b"\x00" * 8  # valid empty points3D.bin (uint64 count = 0)
    (sparse / "points3D.bin").write_bytes(fake_points)

    rescale_model_metadata(sparse, (960, 1280))

    ext2, int2, names2 = read_colmap_model(sparse)
    assert names2 == names
    np.testing.assert_allclose(ext2, extrinsics, atol=1e-5)
    np.testing.assert_allclose(int2, intrinsics, atol=1e-5)
    assert (sparse / "points3D.bin").read_bytes() == fake_points
    # The stored camera must now be at the original resolution.
    from flowmap_tpu.export.colmap_io import read_model

    cameras, _, _ = read_model(sparse)
    camera = next(iter(cameras.values()))
    assert (camera.height, camera.width) == (960, 1280)


def test_run_sparse_missing_binary(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    assert not colmap_available()
    with pytest.raises(FileNotFoundError):
        run_sparse(tmp_path / "in", tmp_path / "out")


def test_run_sparse_with_fake_binary(tmp_path, monkeypatch):
    """Drive run_sparse against a recording fake `colmap` binary: asserts the
    reference's exact reconstruction settings (`run_sparse.py:24-38`) and the
    runtime.json + images contract (`run_sparse.py:43-47`)."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    fake = bin_dir / "colmap"
    fake.write_text("#!/bin/sh\necho \"$@\" > " + str(tmp_path / "argv.txt") + "\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}{os.pathsep}{os.environ['PATH']}")

    images = tmp_path / "images"
    images.mkdir()
    (images / "000000.png").write_bytes(b"fake")
    out = tmp_path / "out"
    elapsed = run_sparse(images, out, seed=7)

    argv = (tmp_path / "argv.txt").read_text()
    for expected in (
        "automatic_reconstructor",
        "--sparse 1",
        "--dense 0",
        "--quality extreme",
        "--data_type video",
        "--camera_model SIMPLE_PINHOLE",
        "--single_camera 1",
        "--random_seed 7",
    ):
        assert expected in argv
    assert json.loads((out / "runtime.json").read_text())["runtime"] == pytest.approx(
        elapsed
    )
    assert (out / "images/000000.png").exists()


def test_rank_and_round():
    values = np.array([[1.234, 5.0], [1.231, 4.0], [2.0, np.nan]])
    rounded = round_values(values, np.array([2, 0]))
    np.testing.assert_allclose(rounded[:, 0], [1.23, 1.23, 2.0])
    ranks = compute_ranks_for_column(rounded[:, 0], -1)
    assert list(ranks) == [0, 0, 1]  # display-precision tie ranks as a tie
    ranks_nan = compute_ranks_for_column(rounded[:, 1], -1)
    assert ranks_nan[2] == max(ranks_nan)  # NaN ranks last


def test_make_latex_table():
    table = make_latex_table(
        {"FlowMap": [3.2, 0.01], "COLMAP": [45.0, None]},
        metrics=["Time (min.)", "ATE"],
        precisions=[1, 3],
        rank_orders=[-1, 0],
        multi_headers=[("T\\&T", 2)],
    )
    assert "\\first{3.2}" in table
    assert "\\second{45.0}" in table
    assert "N/A" in table
    assert "$\\downarrow$" in table
    assert "\\multicolumn{2}{|c}{T\\&T}" in table


def test_dataset_means_and_comparison_table(tmp_path):
    """End-to-end over a synthetic results root: runtime from runtime.json,
    ATE computed vs the 'colmap' method's model (`paper/common.py:212-221`),
    means over the canonical scene list."""
    methods = [Method("flowmap", "FlowMap (TPU)"), Method("colmap", "COLMAP")]
    shape = (96, 128)
    for scene in ("bench", "hydrant"):
        tag = f"co3d_{scene}"
        for method, runtime in (("flowmap", 180.0), ("colmap", 2400.0)):
            scene_dir = tmp_path / method / tag
            _write_synthetic_model(scene_dir / "sparse/0", 6, shape)
            (scene_dir / "runtime.json").write_text(
                json.dumps({"runtime": runtime})
            )

    rows = dataset_means(
        tmp_path, methods, ["co3d"], [METRIC_RUNTIME, METRIC_COLMAP_ATE]
    )
    assert rows["FlowMap (TPU)"][0] == pytest.approx(3.0)  # minutes
    assert rows["COLMAP"][0] == pytest.approx(40.0)
    # Same synthetic model on both sides -> ATE ~ 0; COLMAP row has no ATE.
    assert rows["FlowMap (TPU)"][1] == pytest.approx(0.0, abs=1e-5)
    assert rows["COLMAP"][1] is None

    table = generate_comparison_table(
        tmp_path, methods, ["co3d"], [METRIC_RUNTIME, METRIC_COLMAP_ATE]
    )
    assert "\\first{3.0}" in table and "co3d" in table
