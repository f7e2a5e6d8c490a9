"""Pretraining datasets: RealEstate10k/ACID chunks and CO3Dv2 sequences.

Parity: `flowmap/dataset/dataset_re10k.py:30-176` (chunked `.torch` files of
JPEG bytes + 18-float pose rows, iterable with shuffling and `frame_skip`)
and `dataset_co3d.py:43-255` (gzip-JSON sequence/frame annotations,
NDC-isotropic intrinsics -> normalized K, world-to-camera with xy-flip).
Loading stays host-side; torch is used only to deserialize the RE10k chunk
format (its on-disk container), everything else is NumPy/PIL.
"""

from __future__ import annotations

import gzip
import json
from dataclasses import dataclass
from io import BytesIO
from pathlib import Path
from typing import Literal, Optional

import numpy as np
from PIL import Image

from ..utils.cropping import resize_to_cover_with_intrinsics
from .dataset import DatasetCfgCommon, Stage
from .frame_sampler import FrameSamplerCfg, sample_frames


@dataclass(frozen=True)
class DatasetRE10kCfg(DatasetCfgCommon):
    name: Literal["re10k"] = "re10k"
    roots: tuple[Path, ...] = (Path("datasets/re10k"),)
    load_cameras: bool = False
    frame_skip: int = 1


@dataclass(frozen=True)
class DatasetCO3DCfg(DatasetCfgCommon):
    name: Literal["co3d"] = "co3d"
    root: Path = Path("datasets/co3d")
    set_list: str = "set_lists_fewview_dev.json"
    categories: Optional[tuple[str, ...]] = None
    load_cameras: bool = False
    load_frame_paths: bool = False


def _re10k_convert_poses(poses: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """18-float rows -> (c2w extrinsics, normalized K)
    (`dataset_re10k.py:116-137`)."""
    b = poses.shape[0]
    intrinsics = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
    fx, fy, cx, cy = poses[:, 0], poses[:, 1], poses[:, 2], poses[:, 3]
    intrinsics[:, 0, 0] = fx
    intrinsics[:, 1, 1] = fy
    intrinsics[:, 0, 2] = cx
    intrinsics[:, 1, 2] = cy
    w2c = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    w2c[:, :3] = poses[:, 6:].reshape(b, 3, 4)
    return np.linalg.inv(w2c).astype(np.float32), intrinsics


class DatasetRE10k:
    """Iterable over RE10k/ACID chunk files."""

    def __init__(
        self,
        cfg: DatasetRE10kCfg,
        stage: Stage,
        frame_sampler_cfg: FrameSamplerCfg,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg
        self.stage = stage
        self.frame_sampler_cfg = frame_sampler_cfg
        self.rng = np.random.default_rng(seed)

        self.chunks: list[Path] = []
        for root in cfg.roots:
            stage_dir = Path(root) / self.data_stage
            if stage_dir.exists():
                self.chunks.extend(
                    sorted(p for p in stage_dir.iterdir() if p.suffix == ".torch")
                )

    @property
    def data_stage(self) -> str:
        if self.cfg.scene is not None or self.stage == "val":
            return "test"
        return self.stage

    def __len__(self) -> int:
        return len(self.chunks)

    def __iter__(self):
        import torch  # chunk container format only

        chunks = list(self.chunks)
        if self.stage in ("train", "val"):
            self.rng.shuffle(chunks)

        for chunk_path in chunks:
            chunk = torch.load(chunk_path, weights_only=False)
            if self.cfg.scene is not None:
                chunk = [x for x in chunk if x["key"] == self.cfg.scene]
            if self.stage in ("train", "val"):
                self.rng.shuffle(chunk)

            for example in chunk:
                extrinsics, intrinsics = _re10k_convert_poses(
                    np.asarray(example["cameras"], np.float32)
                )
                indices = np.arange(len(extrinsics))[:: self.cfg.frame_skip]
                picked = sample_frames(
                    self.frame_sampler_cfg, len(indices), self.rng
                )
                indices = indices[picked]

                frames = [
                    Image.open(BytesIO(np.asarray(example["images"][i]).tobytes()))
                    for i in indices
                ]
                k = intrinsics[indices]
                if self.cfg.image_shape is not None:
                    frames, k = resize_to_cover_with_intrinsics(
                        frames, self.cfg.image_shape, k
                    )

                videos = np.stack(
                    [
                        np.asarray(f, np.float32)[..., :3].transpose(2, 0, 1) / 255.0
                        for f in frames
                    ]
                )
                result = {
                    "videos": videos,
                    "indices": indices,
                    "scenes": example["key"],
                    "datasets": "re10k",
                }
                if self.cfg.load_cameras:
                    result["extrinsics"] = extrinsics[indices]
                    result["intrinsics"] = np.asarray(k)
                yield result


class DatasetCO3D:
    """CO3Dv2 sequences (map-style)."""

    def __init__(
        self,
        cfg: DatasetCO3DCfg,
        stage: Stage,
        frame_sampler_cfg: FrameSamplerCfg,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg
        self.stage = stage
        self.frame_sampler_cfg = frame_sampler_cfg
        self.rng = np.random.default_rng(seed)
        self._annotation_cache: dict[str, dict] = {}
        self.sequences: list[tuple[str, str, list[tuple[int, Path]]]] = []
        self._load_sequences()

    def _load_sequences(self) -> None:
        root = Path(self.cfg.root)
        if not root.exists():
            return
        categories = [
            d for d in root.iterdir() if d.is_dir() and not d.name.startswith(".")
        ]
        if self.cfg.categories is not None:
            categories = [c for c in categories if c.name in self.cfg.categories]

        for category in categories:
            annotations_path = category / "sequence_annotations.jgz"
            if not annotations_path.exists():
                continue
            sequence_annotations = json.loads(
                gzip.GzipFile(annotations_path, "rb").read().decode("utf8")
            )
            scored = {
                a["sequence_name"]: a.get("viewpoint_quality_score")
                for a in sequence_annotations
            }
            for example in category.iterdir():
                if not example.is_dir() or not (example / "images").exists():
                    continue
                if scored.get(example.name) is None:
                    continue
                frames = sorted(
                    (int(p.stem[5:]), p)
                    for p in (example / "images").iterdir()
                    if p.name.startswith("frame") and p.suffix == ".jpg"
                )
                self.sequences.append((example.name, category.name, frames))

        if self.cfg.scene is not None:
            self.sequences = [
                s for s in self.sequences if s[0] == self.cfg.scene
            ]

    def _frame_annotations(self, category: str) -> dict:
        if category not in self._annotation_cache:
            raw = json.loads(
                gzip.GzipFile(
                    Path(self.cfg.root) / category / "frame_annotations.jgz", "rb"
                )
                .read()
                .decode("utf8")
            )
            annotations: dict = {}
            for fa in raw:
                annotations.setdefault(fa["sequence_name"], {})[
                    fa["frame_number"]
                ] = {**fa["viewpoint"], **fa["image"]}
            self._annotation_cache[category] = annotations
        return self._annotation_cache[category]

    def _camera(self, category: str, name: str, index: int):
        """NDC-isotropic intrinsics -> normalized K; w2c with xy-flip -> c2w
        (`dataset_co3d.py:169-203`)."""
        annotation = self._frame_annotations(category)[name][index]
        p = annotation["principal_point"]
        f = annotation["focal_length"]
        h, w = annotation["size"]
        assert annotation["intrinsics_format"] == "ndc_isotropic"
        s = min(h, w) / 2
        k = np.eye(3, dtype=np.float32)
        k[0, 0] = f[0] * s
        k[1, 1] = f[1] * s
        k[0, 2] = -p[0] * s + w / 2
        k[1, 2] = -p[1] * s + h / 2
        k[0] /= w
        k[1] /= h

        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.asarray(annotation["R"], np.float32).T
        w2c[:3, 3] = np.asarray(annotation["T"], np.float32)
        flip_xy = np.diag(np.asarray([-1, -1, 1, 1], np.float32))
        w2c = flip_xy @ w2c
        return np.linalg.inv(w2c).astype(np.float32), k

    def __len__(self) -> int:
        return len(self.sequences)

    def __getitem__(self, index: int) -> dict:
        name, category, frames = self.sequences[index]
        picked = sample_frames(self.frame_sampler_cfg, len(frames), self.rng)

        videos, extrinsics, intrinsics, paths = [], [], [], []
        for i in picked:
            frame_number, path = frames[i]
            image = Image.open(path)
            k = None
            if self.cfg.load_cameras:
                c2w, k = self._camera(category, name, frame_number)
                extrinsics.append(c2w)
            if self.cfg.image_shape is not None:
                scaled, k = resize_to_cover_with_intrinsics(
                    [image], self.cfg.image_shape, k
                )
                image = scaled[0]
            if k is not None:
                intrinsics.append(np.asarray(k).reshape(3, 3))
            videos.append(
                np.asarray(image, np.float32)[..., :3].transpose(2, 0, 1) / 255.0
            )
            paths.append(str(path))

        result = {
            "videos": np.stack(videos),
            "indices": np.asarray(picked),
            "scenes": f"{category}/{name}",
            "datasets": "co3d",
        }
        if self.cfg.load_cameras:
            result["extrinsics"] = np.stack(extrinsics)
            result["intrinsics"] = np.stack(intrinsics)
        if self.cfg.load_frame_paths:
            result["frame_paths"] = paths
        return result
