"""Visualization tests: summary panel, trajectory plot, drawing, layout."""

import jax.numpy as jnp
import numpy as np

from flowmap_tpu.ops.geometry import sample_image_grid, unproject
from flowmap_tpu.types import ModelOutput
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene
from flowmap_tpu.visualization import (
    VisualizerSummaryCfg,
    VisualizerTrajectoryCfg,
    run_visualizers,
)
from flowmap_tpu.visualization.color import apply_color_map_to_depth, flow_to_color
from flowmap_tpu.visualization.drawing import draw_lines, draw_points
from flowmap_tpu.visualization.layout import add_border, add_label, hcat, vcat


def _model_output(batch, depths):
    h, w = depths.shape[-2:]
    xy, _ = sample_image_grid((h, w))
    surfaces = unproject(xy, depths, batch.intrinsics[:, :, None, None])
    return ModelOutput(
        depths=depths,
        surfaces=surfaces,
        intrinsics=batch.intrinsics,
        extrinsics=batch.extrinsics,
        backward_correspondence_weights=jnp.ones(
            (1, depths.shape[1] - 1, h, w)
        ),
    )


def test_run_visualizers_produces_images_and_metrics():
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=6, image_shape=(24, 32))
    )
    out = _model_output(batch, depths)
    results = run_visualizers(
        [VisualizerSummaryCfg(num_vis_frames=4), VisualizerTrajectoryCfg()],
        batch,
        flows,
        None,
        out,
        global_step=100,
    )
    assert "summary" in results and results["summary"].ndim == 3
    assert results["summary"].min() >= 0 and results["summary"].max() <= 1
    assert "metrics/ate" in results and results["metrics/ate"].ndim == 0
    # Perfect poses -> essentially zero ATE.
    assert float(results["metrics/ate"]) < 1e-5
    assert "trajectory" in results and results["trajectory"].shape[-1] == 3


def test_colormaps():
    depth = np.exp(np.random.default_rng(0).normal(size=(8, 10)))
    colored = apply_color_map_to_depth(depth)
    assert colored.shape == (8, 10, 3)
    flow = np.random.default_rng(1).normal(size=(8, 10, 2))
    wheel = flow_to_color(flow)
    assert wheel.shape == (8, 10, 3)
    assert wheel.min() >= 0 and wheel.max() <= 1


def test_drawing_points_and_lines():
    image = np.zeros((3, 32, 32), np.float32)
    out = draw_points(image, [[16, 16]], color=(1, 0, 0), radius=4)
    assert out[0, 16, 16] > 0.9  # red filled center
    assert out[2].max() < 0.5
    out2 = draw_lines(image, [[4, 4]], [[28, 28]], color=(0, 1, 0), width=2)
    assert out2[1, 16, 16] > 0.5  # green along the diagonal


def test_layout():
    a = np.ones((3, 8, 10), np.float32) * 0.2
    b = np.ones((3, 12, 6), np.float32) * 0.8
    h = hcat(a, b, gap=2)
    assert h.shape == (3, 12, 10 + 2 + 6)
    v = vcat(a, b, gap=3)
    assert v.shape == (3, 8 + 3 + 12, 10)
    assert add_border(a, 2).shape == (3, 12, 14)
    labeled = add_label(a, "hello")
    assert labeled.shape[1] > a.shape[1]
