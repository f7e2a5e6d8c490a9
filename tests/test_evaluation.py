"""Evaluation tooling tests: ATE matching, tables, model checks."""

import numpy as np

from flowmap_tpu.evaluation import (
    check_model,
    evaluate_against_colmap,
    scene_table,
)
from flowmap_tpu.export import write_colmap_model


def _poses(rng, f):
    from flowmap_tpu.ops.procrustes import quaternion_to_matrix
    import jax.numpy as jnp

    out = np.broadcast_to(np.eye(4, dtype=np.float32), (f, 4, 4)).copy()
    qs = rng.normal(size=(f, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    out[:, :3, :3] = np.asarray(quaternion_to_matrix(jnp.asarray(qs)))
    out[:, :3, 3] = rng.normal(size=(f, 3))
    return out


def test_evaluate_against_colmap_zero_for_identical(tmp_path):
    rng = np.random.default_rng(0)
    ext = _poses(rng, 6)
    intr = np.broadcast_to(
        np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (6, 3, 3)
    )
    names = [f"{i}.png" for i in range(6)]
    write_colmap_model(tmp_path / "a", ext, intr, names, (100, 200))
    write_colmap_model(tmp_path / "b", ext, intr, names, (100, 200))
    result = evaluate_against_colmap(tmp_path / "a", tmp_path / "b")
    assert result["matched_frames"] == 6
    assert result["ate"] < 1e-5


def test_evaluate_against_colmap_partial_overlap(tmp_path):
    rng = np.random.default_rng(1)
    ext = _poses(rng, 8)
    intr = np.broadcast_to(
        np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (8, 3, 3)
    )
    write_colmap_model(
        tmp_path / "a", ext[:6], intr[:6], [f"{i}.png" for i in range(6)], (10, 20)
    )
    write_colmap_model(
        tmp_path / "b", ext[2:], intr[2:], [f"{i}.png" for i in range(2, 8)], (10, 20)
    )
    result = evaluate_against_colmap(tmp_path / "a", tmp_path / "b")
    assert result["matched_frames"] == 4


def test_check_model(tmp_path):
    rng = np.random.default_rng(2)
    ext = _poses(rng, 4)
    intr = np.broadcast_to(
        np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (4, 3, 3)
    )
    write_colmap_model(tmp_path / "s", ext, intr, [f"{i}.png" for i in range(4)], (64, 64))
    result = check_model(tmp_path / "s")
    assert result["ok"], result
    assert result["num_images"] == 4
    assert not check_model(tmp_path / "missing")["ok"]


def test_scene_table():
    rows = [
        {"scene": "fern", "ate_vs_gt": 0.01, "runtime": 120.0},
        {"scene": "trex", "ate_vs_gt": 0.03, "runtime": 100.0},
    ]
    table = scene_table(rows)
    assert "fern" in table and "mean" in table
    assert "0.02" in table  # mean ATE
