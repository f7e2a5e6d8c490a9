"""Integration test of the overfit CLI path (config -> dataset -> flow ->
optimize -> export), using a synthetic scene written to disk."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from flowmap_tpu.config import OverfitCfg, compose_config
from flowmap_tpu.flow.predictors import save_flows
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    batch, flows, _ = make_scene(SyntheticSceneCfg(num_frames=8, image_shape=(48, 64)))
    images_dir = root / "images"
    images_dir.mkdir()
    videos = np.asarray(batch.videos[0])  # (f, 3, h, w)
    for i, frame in enumerate(videos):
        arr = (frame.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(images_dir / f"{i:0>6}.png")
    save_flows(root / "flows.npz", flows)
    return root


def test_overfit_cli_end_to_end(scene_dir, tmp_path):
    from flowmap_tpu.overfit import overfit

    out_dir = tmp_path / "out"
    cfg = compose_config(
        "overfit",
        OverfitCfg,
        [
            f"dataset.images.root={scene_dir}/images",
            f"flow=precomputed",
            f"flow.path={scene_dir}/flows.npz",
            "model/backbone=explicit_depth",
            "model.backbone.initial_depth=1.0",
            "model/intrinsics=regressed",
            "model.intrinsics.initial_focal_length=1.1",
            "loss=[flow]",
            "trainer.max_steps=40",
            "trainer.val_check_interval=20",
            "model_wrapper.lr=1e-2",
            "cropping.image_shape=[48,64]",
            "cropping.patch_size=16",
            "cropping.flow_scale_multiplier=1",
            f"output_dir={out_dir}",
        ],
    )
    result = overfit(cfg)

    assert (out_dir / "runtime.json").exists()
    runtime = json.loads((out_dir / "runtime.json").read_text())
    assert runtime["optimization_runtime"] > 0
    assert (out_dir / "colmap/sparse/0/cameras.bin").exists()
    assert (out_dir / "colmap/sparse/0/images.bin").exists()
    assert (out_dir / "colmap/sparse/0/points3D.ply").exists()
    assert (out_dir / "colmap/images").exists()
    # Visualization images were written.
    assert any((out_dir / "summary").glob("*.png"))
    # Loss decreased.
    history = result["info"]["history"]["loss/total"]
    assert history[-1] <= history[0]
