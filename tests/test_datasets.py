"""Fixture tests for the LLFF / RE10k / CO3D loaders with synthetic on-disk
data in the exact reference formats (`flowmap/dataset/dataset_llff.py:51-137`,
`dataset_re10k.py:30-176`, `dataset_co3d.py:43-255`)."""

import gzip
import io
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from flowmap_tpu.datasets.dataset import DatasetLLFF, DatasetLLFFCfg
from flowmap_tpu.datasets.dataset_pretrain import (
    DatasetCO3D,
    DatasetCO3DCfg,
    DatasetRE10k,
    DatasetRE10kCfg,
    _re10k_convert_poses,
)
from flowmap_tpu.datasets.frame_sampler import (
    FrameSamplerOverfitCfg,
    FrameSamplerPretrainCfg,
)


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float64,
    )


def _save_jpg(path: Path, h: int, w: int, rng: np.random.Generator) -> None:
    arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------------------
# LLFF


@pytest.fixture()
def llff_root(tmp_path):
    rng = np.random.default_rng(0)
    scene = tmp_path / "fern"
    (scene / "images").mkdir(parents=True)
    n, h, w, focal = 6, 24, 32, 40.0
    for i in range(n):
        _save_jpg(scene / "images" / f"image{i:03d}.jpg", h, w, rng)

    # poses_bounds.npy rows: flattened 3x5 [R|t|hwf] (down-right-back) + 2 bounds.
    rows = []
    c2w_drb = []
    for _ in range(n):
        r = _random_rotation(rng)
        t = rng.normal(size=3)
        block = np.concatenate(
            [r, t[:, None], np.asarray([[h], [w], [focal]])], axis=1
        )
        rows.append(np.concatenate([block.flatten(), [1.0, 10.0]]))
        c2w_drb.append((r, t))
    np.save(scene / "poses_bounds.npy", np.stack(rows))
    return tmp_path, c2w_drb, (n, h, w, focal)


def test_llff_metadata_conversion(llff_root):
    root, c2w_drb, (n, h, w, focal) = llff_root
    name, extrinsics, intrinsics = DatasetLLFF.load_metadata(root / "fern")
    assert name == "fern"
    assert extrinsics.shape == (n, 4, 4)

    # The down-right-back -> OpenCV (right-down-forward) conversion swaps the
    # first two columns and flips the third (`dataset_llff.py:108-137`).
    r, t = c2w_drb[0]
    expected = np.eye(4)
    expected[:3, 0] = r[:, 1]
    expected[:3, 1] = r[:, 0]
    expected[:3, 2] = -r[:, 2]
    expected[:3, 3] = t
    np.testing.assert_allclose(extrinsics[0], expected, atol=1e-5)
    # Rotations stay orthonormal with det +1.
    rot = extrinsics[:, :3, :3]
    np.testing.assert_allclose(
        rot @ rot.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (n, 3, 3)),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)

    # Normalized intrinsics: fx = f/w, fy = f/h, principal point centered.
    np.testing.assert_allclose(intrinsics[:, 0, 0], focal / w, atol=1e-6)
    np.testing.assert_allclose(intrinsics[:, 1, 1], focal / h, atol=1e-6)
    np.testing.assert_allclose(intrinsics[:, :2, 2], 0.5)


def test_llff_getitem_cover_crop(llff_root):
    root, _, (n, h, w, _) = llff_root
    dataset = DatasetLLFF(
        DatasetLLFFCfg(image_shape=(16, 16), root=root),
        "train",
        FrameSamplerOverfitCfg(),
    )
    assert len(dataset) == 1
    example = dataset[0]
    assert example["videos"].shape == (n, 3, 16, 16)
    assert example["datasets"] == "llff"
    assert example["extrinsics"].shape == (n, 4, 4)
    # Cover-resize to square from a 24x32 source crops width: fx grows by the
    # crop factor while fy is only rescaled (normalized K is scale-free).
    base = DatasetLLFF.load_metadata(root / "fern")[2]
    k = example["intrinsics"]
    np.testing.assert_allclose(k[:, 1, 1], base[:, 1, 1], rtol=1e-5)
    # Pre-crop shape is integer-rounded: 24x32 covers 16x16 via a 16x21 resize.
    np.testing.assert_allclose(k[:, 0, 0], base[:, 0, 0] * (21 / 16), rtol=1e-5)


# ---------------------------------------------------------------------------
# RE10k


def _re10k_chunk(tmp_path, n_frames=10, h=24, w=32):
    import torch

    rng = np.random.default_rng(1)
    cameras, w2c_all = [], []
    for _ in range(n_frames):
        r = _random_rotation(rng)
        t = rng.normal(size=3)
        w2c = np.concatenate([r, t[:, None]], axis=1)  # 3x4
        row = np.concatenate([[0.8, 0.9, 0.5, 0.5, 0.0, 0.0], w2c.flatten()])
        cameras.append(row.astype(np.float32))
        w2c_all.append(w2c)
    images = []
    for _ in range(n_frames):
        buf = io.BytesIO()
        Image.fromarray(
            (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        images.append(torch.frombuffer(bytearray(buf.getvalue()), dtype=torch.uint8))

    chunk = [
        {
            "key": "scene_a",
            "cameras": torch.from_numpy(np.stack(cameras)),
            "images": images,
        }
    ]
    stage_dir = tmp_path / "re10k" / "train"
    stage_dir.mkdir(parents=True)
    torch.save(chunk, stage_dir / "000000.torch")
    return tmp_path / "re10k", np.stack(w2c_all)


def test_re10k_pose_conversion():
    rng = np.random.default_rng(2)
    r = _random_rotation(rng)
    t = rng.normal(size=3)
    row = np.concatenate(
        [[0.7, 0.8, 0.45, 0.55, 0, 0], np.concatenate([r, t[:, None]], 1).flatten()]
    ).astype(np.float32)[None]
    c2w, k = _re10k_convert_poses(row)
    w2c = np.eye(4)
    w2c[:3, :3] = r
    w2c[:3, 3] = t
    np.testing.assert_allclose(c2w[0] @ w2c, np.eye(4), atol=1e-5)
    np.testing.assert_allclose(
        [k[0, 0, 0], k[0, 1, 1], k[0, 0, 2], k[0, 1, 2]], [0.7, 0.8, 0.45, 0.55],
        rtol=1e-6,
    )


def test_re10k_iterates_chunks(tmp_path):
    root, w2c_all = _re10k_chunk(tmp_path)
    dataset = DatasetRE10k(
        DatasetRE10kCfg(image_shape=(16, 16), roots=(root,), load_cameras=True),
        "train",
        FrameSamplerPretrainCfg(num_frames=4),
    )
    assert len(dataset) == 1
    example = next(iter(dataset))
    assert example["videos"].shape == (4, 3, 16, 16)
    assert example["scenes"] == "scene_a"
    assert example["datasets"] == "re10k"
    # Extrinsics are the inverses of the stored w2c rows at the picked indices.
    for ext, i in zip(example["extrinsics"], example["indices"]):
        w2c = np.eye(4)
        w2c[:3] = w2c_all[i]
        np.testing.assert_allclose(ext @ w2c, np.eye(4), atol=1e-4)


def test_re10k_frame_skip(tmp_path):
    root, _ = _re10k_chunk(tmp_path)
    dataset = DatasetRE10k(
        DatasetRE10kCfg(roots=(root,), frame_skip=2),
        "train",
        FrameSamplerPretrainCfg(num_frames=4),
    )
    example = next(iter(dataset))
    assert all(i % 2 == 0 for i in example["indices"])


# ---------------------------------------------------------------------------
# CO3D


@pytest.fixture()
def co3d_root(tmp_path):
    rng = np.random.default_rng(3)
    n, h, w = 6, 24, 32
    category = tmp_path / "co3d" / "hydrant"
    seq = category / "seq_001"
    (seq / "images").mkdir(parents=True)
    for i in range(n):
        _save_jpg(seq / "images" / f"frame{i + 1:06d}.jpg", h, w, rng)

    seq_annotations = [
        {"sequence_name": "seq_001", "viewpoint_quality_score": 0.9},
        {"sequence_name": "seq_missing", "viewpoint_quality_score": None},
    ]
    (category / "sequence_annotations.jgz").write_bytes(
        gzip.compress(json.dumps(seq_annotations).encode())
    )

    frame_annotations, truth = [], {}
    for i in range(n):
        r = _random_rotation(rng)
        t = rng.normal(size=3)
        f = (1.9, 2.1)
        p = (0.01, -0.02)
        frame_annotations.append(
            {
                "sequence_name": "seq_001",
                "frame_number": i + 1,
                "viewpoint": {
                    "R": r.tolist(),
                    "T": t.tolist(),
                    "focal_length": list(f),
                    "principal_point": list(p),
                    "intrinsics_format": "ndc_isotropic",
                },
                "image": {"size": [h, w]},
            }
        )
        truth[i + 1] = (r, t, f, p)
    (category / "frame_annotations.jgz").write_bytes(
        gzip.compress(json.dumps(frame_annotations).encode())
    )
    return tmp_path / "co3d", truth, (n, h, w)


def test_co3d_sequences_and_cameras(co3d_root):
    root, truth, (n, h, w) = co3d_root
    dataset = DatasetCO3D(
        DatasetCO3DCfg(root=root, load_cameras=True, load_frame_paths=True),
        "train",
        FrameSamplerPretrainCfg(num_frames=4),
    )
    # The unscored sequence is filtered out.
    assert len(dataset) == 1
    example = dataset[0]
    assert example["videos"].shape == (4, 3, h, w)
    assert example["scenes"] == "hydrant/seq_001"

    for ext, k, i in zip(
        example["extrinsics"], example["intrinsics"], example["indices"]
    ):
        r, t, f, p = truth[int(i) + 1]
        # NDC-isotropic -> normalized K (`dataset_co3d.py:169-203`).
        s = min(h, w) / 2
        np.testing.assert_allclose(k[0, 0], f[0] * s / w, rtol=1e-5)
        np.testing.assert_allclose(k[1, 1], f[1] * s / h, rtol=1e-5)
        np.testing.assert_allclose(k[0, 2], (-p[0] * s + w / 2) / w, rtol=1e-5)
        np.testing.assert_allclose(k[1, 2], (-p[1] * s + h / 2) / h, rtol=1e-5)
        # c2w inverts flip_xy @ w2c where w2c = [R^T | T].
        w2c = np.eye(4)
        w2c[:3, :3] = r.T
        w2c[:3, 3] = t
        flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        np.testing.assert_allclose(ext @ (flip @ w2c), np.eye(4), atol=1e-4)


def test_merged_interleaves_map_and_iterable(co3d_root, tmp_path):
    """DatasetMerged mixes map-style (co3d) and iterable (re10k) children in
    one proportional stream (`dataset_merged.py:5-31`)."""
    from flowmap_tpu.datasets.dataset import DatasetMerged

    co3d_path, _, _ = co3d_root
    re10k_path, _ = _re10k_chunk(tmp_path)
    co3d = DatasetCO3D(
        DatasetCO3DCfg(root=co3d_path), "train", FrameSamplerPretrainCfg(4)
    )
    re10k = DatasetRE10k(
        DatasetRE10kCfg(roots=(re10k_path,), image_shape=(16, 16)),
        "train",
        FrameSamplerPretrainCfg(4),
    )
    merged = DatasetMerged([co3d, re10k])
    assert merged.is_iterable
    assert len(merged) == 2
    examples = list(merged)
    assert sorted(e["datasets"] for e in examples) == ["co3d", "re10k"]

    # Map-style-only merges stay indexable.
    map_only = DatasetMerged([co3d])
    assert not map_only.is_iterable
    assert map_only[0]["datasets"] == "co3d"


def test_co3d_category_filter(co3d_root):
    root, _, _ = co3d_root
    dataset = DatasetCO3D(
        DatasetCO3DCfg(root=root, categories=("teddybear",)),
        "train",
        FrameSamplerPretrainCfg(num_frames=4),
    )
    assert len(dataset) == 0
