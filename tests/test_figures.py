"""Paper figure generation smoke + semantics tests (synthetic fixtures).

Covers `flowmap_tpu/evaluation/figures.py`: ATE curve loading/plotting,
trajectory alignment figures, and the isometric point-cloud render —
the TPU-repo equivalents of `/root/reference/paper/plot_ablation_ate.py`,
`paper/generate_trajectory_plots.py`, `paper/render_point_cloud.py`.
"""

import json

import numpy as np
import pytest

from flowmap_tpu.evaluation import figures as fg


def test_load_ate_series_json_list(tmp_path):
    path = tmp_path / "flowmap.json"
    path.write_text(json.dumps([0.5, 0.1, 0.05]))
    assert fg.load_ate_series(path) == [0.5, 0.1, 0.05]


def test_load_ate_series_step_dumps(tmp_path):
    d = tmp_path / "method"
    d.mkdir()
    for step, ate in [(50, 0.5), (100, 0.25), (150, 0.1)]:
        (d / f"ate_{step:0>6}.json").write_text(
            json.dumps({"step": step, "ate": ate})
        )
    assert fg.load_ate_series(d) == [0.5, 0.25, 0.1]


def test_plot_ate_curves_writes_svg(tmp_path):
    out = tmp_path / "fig" / "ate.svg"
    fg.plot_ate_curves(
        {"a": [0.5, 0.2, 0.1], "b": [0.4, 0.3, 0.2]},
        out,
        colors={"a": "#E6194B"},
    )
    assert out.exists() and out.stat().st_size > 0


def _helix(n=40, phase=0.0):
    t = np.linspace(0, 4 * np.pi, n)
    return np.stack(
        [np.cos(t + phase), np.sin(t + phase), 0.1 * t], axis=-1
    ).astype(np.float64)


def test_pca_rotation_is_a_rotation():
    r = fg._pca_rotation(_helix())
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(abs(np.linalg.det(r)), 1.0, atol=1e-8)


def test_plot_trajectories_writes_figure(tmp_path):
    out = tmp_path / "traj.svg"
    fg.plot_trajectories(
        {"COLMAP": _helix(), "FlowMap": 2.0 * _helix(phase=0.01) + 3.0},
        out,
    )
    assert out.exists() and out.stat().st_size > 0


def test_isometric_project_ordering():
    pts = np.asarray([[0.0, 0.0, 0.0], [1.0, -1.0, -1.0]], np.float32)
    xy, order = fg.isometric_project(pts, np.zeros(3), 10.0, 100)
    assert xy.shape == (2, 2)
    # Second point has larger look-dot -> sorted after the first.
    assert list(order) == [0, 1]


def test_frustum_lines_shapes_and_origin():
    f = 3
    extrinsics = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    extrinsics[:, 0, 3] = np.arange(f)
    k = np.asarray(
        [[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]], np.float32
    )
    intrinsics = np.tile(k, (f, 1, 1))
    lines = fg.frustum_lines(extrinsics, intrinsics, z_value=0.5)
    assert lines.shape == (f, 2, 8, 3)
    # The last four segments start at the camera origin.
    for i in range(f):
        origin = extrinsics[i, :3, 3]
        np.testing.assert_allclose(lines[i, 0, 4:], np.tile(origin, (4, 1)),
                                   atol=1e-6)


def test_render_point_cloud_smoke():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    rgb = rng.uniform(size=(500, 3)).astype(np.float32)
    extrinsics = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    extrinsics[:, 2, 3] = -np.arange(4)
    k = np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], np.float32)
    intrinsics = np.tile(k, (4, 1, 1))
    cfg = fg.PointCloudRenderCfg(canvas_size=128, scale=15.0, max_points=200)
    image = fg.render_point_cloud(xyz, rgb, extrinsics, intrinsics, cfg)
    assert image.shape == (3, 128, 128)
    assert np.all(image >= 0) and np.all(image <= 1)
    # Something was drawn (canvas isn't uniform background).
    assert image.std() > 0.01


def test_unproject_exports_roundtrip():
    """Points unprojected from constant depth at identity pose lie on a
    plane z = depth."""
    f, h, w = 2, 16, 24
    depths = np.full((1, f, h, w), 2.0, np.float32)
    k = np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], np.float32)
    intrinsics = np.tile(k, (1, f, 1, 1))
    extrinsics = np.tile(np.eye(4, dtype=np.float32), (1, f, 1, 1))
    xyz, rgb = fg.unproject_exports(depths, intrinsics, extrinsics, stride=4)
    np.testing.assert_allclose(xyz[:, 2], 2.0, atol=1e-6)
    assert rgb.shape == (xyz.shape[0], 3)


@pytest.mark.parametrize("entry", ["json", "dir"])
def test_cli_plot_ablation_ate(tmp_path, entry, monkeypatch, capsys):
    import sys

    ates = tmp_path / "ates"
    ates.mkdir()
    if entry == "json":
        (ates / "flowmap.json").write_text(json.dumps([0.3, 0.2]))
    else:
        d = ates / "flowmap"
        d.mkdir()
        (d / "ate_000050.json").write_text(json.dumps({"step": 50, "ate": 0.3}))
    out = tmp_path / "fig.svg"
    monkeypatch.setattr(
        sys, "argv",
        ["plot", "--ates", str(ates), "--out", str(out)],
    )
    from scripts.paper.plot_ablation_ate import main

    main()
    assert out.exists()
