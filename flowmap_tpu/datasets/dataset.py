"""Dataset layer: torch-free scene loading into `Batch` pytrees.

Parity: `flowmap/dataset/` in the reference (images / llff / colmap datasets,
merged interleaving, example dicts). Loading is host-side NumPy/PIL; a scene
example is a dict that `example_to_batch` turns into a device `Batch`.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional

import numpy as np
from PIL import Image

from ..types import Batch
from ..utils.cropping import resize_to_cover
from .frame_sampler import FrameSamplerCfg, sample_frames

Stage = Literal["train", "val", "test"]


@dataclass(frozen=True)
class DatasetCfgCommon:
    image_shape: Optional[tuple[int, int]] = None
    scene: Optional[str] = None


@dataclass(frozen=True)
class DatasetImagesCfg(DatasetCfgCommon):
    name: Literal["images"] = "images"
    root: Path = Path("datasets/images")


@dataclass(frozen=True)
class DatasetLLFFCfg(DatasetCfgCommon):
    name: Literal["llff"] = "llff"
    root: Path = Path("datasets/llff")


@dataclass(frozen=True)
class DatasetCOLMAPCfg(DatasetCfgCommon):
    name: Literal["colmap"] = "colmap"
    root: Path = Path("datasets/colmap")
    reorder: bool = True
    use_image_folder_fallback: bool = True


def _load_image(path: Path, shape: Optional[tuple[int, int]]):
    image = Image.open(path)
    if shape is None:
        pre_crop_shape = (image.height, image.width)
    else:
        image, pre_crop_shape = resize_to_cover(image, shape)
    array = np.asarray(image, dtype=np.float32) / 255.0
    if array.ndim == 2:
        array = array[..., None].repeat(3, axis=-1)
    return array[..., :3].transpose(2, 0, 1), pre_crop_shape  # (3, h, w)


class DatasetImages:
    """Folder of images -> one whole-video example
    (`dataset_images.py:24-58`)."""

    def __init__(
        self,
        cfg: DatasetImagesCfg,
        stage: Stage,
        frame_sampler_cfg: FrameSamplerCfg,
    ) -> None:
        self.cfg = cfg
        self.frame_sampler_cfg = frame_sampler_cfg
        assert cfg.image_shape is None
        self.frame_paths = tuple(
            sorted(p for p in Path(cfg.root).iterdir() if p.is_file())
        )

    def __len__(self) -> int:
        return 1

    def __getitem__(self, index: int) -> dict:
        from ..utils.native_io import load_image_batch

        indices = sample_frames(self.frame_sampler_cfg, len(self.frame_paths))
        paths = [self.frame_paths[i] for i in indices]
        # Threaded native decode (libjpeg/libpng); PIL fallback inside.
        videos = load_image_batch(paths)
        return {
            "videos": videos,
            "indices": indices,
            "scenes": Path(self.cfg.root).stem,
            "datasets": "images",
            "frame_paths": paths,
        }


class DatasetLLFF:
    """LLFF scenes with `poses_bounds.npy` ground truth
    (`dataset_llff.py:51-137`)."""

    def __init__(
        self,
        cfg: DatasetLLFFCfg,
        stage: Stage,
        frame_sampler_cfg: FrameSamplerCfg,
    ) -> None:
        self.cfg = cfg
        self.frame_sampler_cfg = frame_sampler_cfg
        root = Path(cfg.root)
        if cfg.scene is None:
            self.scenes = sorted(p.name for p in root.iterdir() if p.is_dir())
        else:
            self.scenes = [cfg.scene]

    def __len__(self) -> int:
        return len(self.scenes)

    @staticmethod
    def load_metadata(path: Path):
        """poses_bounds.npy -> OpenCV c2w extrinsics + normalized intrinsics.

        LLFF stores 3x5 [R|t|hwf] blocks in a down-right-back convention; the
        column swap + z-flip conversion matches `dataset_llff.py:108-137`.
        """
        metadata = np.load(path / "poses_bounds.npy")
        b = metadata.shape[0]
        cameras = metadata[:, :-2].reshape(b, 3, 5)
        rotation = cameras[:, :3, :3]
        translation = cameras[:, :3, 3]
        h, w, f = cameras[:, 0, 4], cameras[:, 1, 4], cameras[:, 2, 4]

        extrinsics = np.broadcast_to(np.eye(4), (b, 4, 4)).copy()
        extrinsics[:, :3, :3] = rotation
        extrinsics[:, :3, 3] = translation
        conversion = np.zeros((4, 4), dtype=np.float64)
        conversion[0, 1] = 1
        conversion[1, 0] = 1
        conversion[2, 2] = -1
        conversion[3, 3] = 1
        extrinsics = extrinsics @ conversion

        intrinsics = np.broadcast_to(np.eye(3), (b, 3, 3)).copy()
        intrinsics[:, :2, 2] = 0.5
        intrinsics[:, 0, 0] = f / w
        intrinsics[:, 1, 1] = f / h
        return (
            path.stem,
            extrinsics.astype(np.float32),
            intrinsics.astype(np.float32),
        )

    def __getitem__(self, index: int) -> dict:
        path = Path(self.cfg.root) / self.scenes[index % len(self.scenes)]
        name, extrinsics, intrinsics = self.load_metadata(path)
        indices = sample_frames(self.frame_sampler_cfg, len(extrinsics))

        image_paths = sorted((path / "images").iterdir())
        image_paths = [image_paths[i] for i in indices]
        images, pre_crop_shape = [], None
        for image_path in image_paths:
            image, pre_crop_shape = _load_image(image_path, self.cfg.image_shape)
            images.append(image)
        videos = np.stack(images)
        _, _, h, w = videos.shape

        intr = intrinsics[indices].copy()
        # Adjust for the cover-crop (fx, fy only; cx = cy = 0.5 preserved).
        intr[:, 0, 0] *= pre_crop_shape[1] / w
        intr[:, 1, 1] *= pre_crop_shape[0] / h

        return {
            "extrinsics": extrinsics[indices],
            "intrinsics": intr,
            "videos": videos,
            "indices": indices,
            "scenes": name,
            "datasets": "llff",
            "frame_paths": [str(p) for p in image_paths],
        }


class DatasetCOLMAP:
    """A COLMAP sparse model as ground truth, with image-folder fallback
    (`dataset_colmap.py:28-84`)."""

    def __init__(
        self,
        cfg: DatasetCOLMAPCfg,
        stage: Stage,
        frame_sampler_cfg: FrameSamplerCfg,
    ) -> None:
        from ..export.colmap import read_colmap_model

        self.cfg = cfg
        self.frame_sampler_cfg = frame_sampler_cfg
        root = Path(cfg.root)

        if cfg.use_image_folder_fallback and not (root / "sparse").exists():
            self.fallback = DatasetImages(
                DatasetImagesCfg(cfg.image_shape, cfg.scene, "images", root),
                stage,
                frame_sampler_cfg,
            )
            return
        self.fallback = None
        assert cfg.image_shape is None

        self.extrinsics, self.intrinsics, image_names = read_colmap_model(
            root / "sparse/0", reorder=cfg.reorder
        )
        self.frame_paths = [root / "images" / name for name in image_names]

    def __len__(self) -> int:
        return 1

    def __getitem__(self, index: int) -> dict:
        if self.fallback is not None:
            return self.fallback[index]
        indices = sample_frames(self.frame_sampler_cfg, len(self.frame_paths))
        images = [_load_image(self.frame_paths[i], None)[0] for i in indices]
        return {
            "videos": np.stack(images),
            "extrinsics": self.extrinsics[indices],
            "intrinsics": self.intrinsics[indices],
            "indices": indices,
            "scenes": Path(self.cfg.root).stem,
            "datasets": "images",
            "frame_paths": [self.frame_paths[i] for i in indices],
        }


class DatasetMerged:
    """Interleave multiple datasets proportionally (`dataset_merged.py:5-31`).

    Like the reference, iteration yields from each child with probability
    proportional to its remaining length, so map-style (images/llff/co3d) and
    iterable (re10k) children mix in one stream. `__getitem__` additionally
    supports direct indexing when every child is map-style (the overfit path
    reads `dataset[0]`); `is_iterable` tells loaders which access pattern to
    use."""

    def __init__(self, datasets: list, seed: int = 0) -> None:
        self.datasets = datasets
        self.seed = seed
        self._epoch = 0
        self.is_iterable = not all(
            hasattr(d, "__getitem__") for d in datasets
        )

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, index: int) -> dict:
        if self.is_iterable:
            raise TypeError(
                "merged dataset contains iterable-only children; iterate it"
            )
        for dataset in self.datasets:
            if index < len(dataset):
                return dataset[index]
            index -= len(dataset)
        raise IndexError(index)

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        remaining = [len(d) for d in self.datasets]
        iterators = [iter(d) for d in self.datasets]
        while sum(remaining) > 0:
            chosen = int(rng.integers(0, sum(remaining)))
            for i, left in enumerate(remaining):
                if chosen < left:
                    yield next(iterators[i])
                    remaining[i] -= 1
                    break
                chosen -= left


def example_to_batch(example: dict) -> tuple[Batch, list[Path]]:
    """Collate one example dict into a batch-of-1 `Batch` pytree."""
    import jax.numpy as jnp

    batch = Batch(
        videos=jnp.asarray(example["videos"])[None],
        indices=jnp.asarray(example["indices"])[None],
        extrinsics=(
            jnp.asarray(example["extrinsics"])[None]
            if "extrinsics" in example
            else None
        ),
        intrinsics=(
            jnp.asarray(example["intrinsics"])[None]
            if "intrinsics" in example
            else None
        ),
        scenes=(example["scenes"],),
        datasets=(example["datasets"],),
    )
    return batch, [Path(p) for p in example.get("frame_paths", [])]
