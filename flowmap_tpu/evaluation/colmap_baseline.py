"""COLMAP baseline protocol.

Parity target: the reference's baseline-comparison half of the measurement
protocol — `scripts/colmap/run_sparse.py:14-47` (sparse reconstruction +
runtime.json), `scripts/colmap/run_dense.py:10-57` (undistort → patch-match
stereo → fusion → points3D.ply), and
`scripts/colmap/run_both_at_flowmap_resolution.py:23-94` (run COLMAP at the
exact resolution FlowMap sees, then rescale the model metadata back to the
original resolution so downstream NVS sees full-res images).

The subprocess drivers require the `colmap` binary (not present in every
image — they raise a clear error if missing). The resize / metadata-rescale
logic is pure Python and unit-tested without the binary.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path
from time import time
from typing import Literal, Optional

from ..export.colmap import read_colmap_model, write_colmap_model
from ..utils.cropping import CroppingCfg, get_image_shape

Quality = Literal["low", "medium", "high", "extreme"]
DataType = Literal["individual", "video", "internet"]


def colmap_available(binary: str = "colmap") -> bool:
    return shutil.which(binary) is not None


def _run(command: list[str]) -> None:
    if subprocess.run(command).returncode != 0:
        raise RuntimeError(f"COLMAP command failed: {' '.join(command)}")


def _require_colmap(binary: str) -> None:
    if not colmap_available(binary):
        raise FileNotFoundError(
            f"The '{binary}' binary is not on PATH. Install COLMAP to run the "
            "baseline protocol; the resize/rescale helpers work without it."
        )


def run_sparse(
    input_path: Path,
    output_path: Path,
    seed: Optional[int] = None,
    quality: Quality = "extreme",
    data_type: DataType = "video",
    binary: str = "colmap",
) -> float:
    """Sparse reconstruction with the reference's settings
    (`run_sparse.py:24-47`): SIMPLE_PINHOLE, single camera, sparse only.
    Returns the elapsed runtime (also written to runtime.json)."""
    _require_colmap(binary)
    input_path, output_path = Path(input_path), Path(output_path)
    output_path.mkdir(exist_ok=True, parents=True)
    start_time = time()
    _run(
        [
            binary,
            "automatic_reconstructor",
            "--image_path", str(input_path),
            "--workspace_path", str(output_path),
            "--sparse", "1",
            "--dense", "0",
            "--quality", quality,
            "--data_type", data_type,
            "--camera_model", "SIMPLE_PINHOLE",
            "--single_camera", "1",
            "--use_gpu", "1",
            "--random_seed", str(seed or 0),
        ]
    )
    elapsed = time() - start_time
    (output_path / "runtime.json").write_text(json.dumps({"runtime": elapsed}))
    shutil.copytree(input_path, output_path / "images", dirs_exist_ok=True)
    return elapsed


def run_dense(
    input_path: Path, output_path: Path, binary: str = "colmap"
) -> float:
    """Dense MVS on top of a sparse model (`run_dense.py:10-57`):
    undistort → geometric patch-match stereo → fusion; the fused cloud is
    copied to sparse/0/points3D.ply for 3D Gaussian Splatting."""
    _require_colmap(binary)
    input_path, output_path = Path(input_path), Path(output_path)
    if (input_path / "sparse/1").exists():
        raise FileExistsError(
            "More than one sparse model exists; sparse reconstruction failed."
        )
    shutil.copytree(input_path, output_path)
    start_time = time()
    _run(
        [
            binary, "image_undistorter",
            "--image_path", str(output_path / "images"),
            "--input_path", str(output_path / "sparse/0"),
            "--output_path", str(output_path / "dense"),
            "--output_type", "COLMAP",
        ]
    )
    _run(
        [
            binary, "patch_match_stereo",
            "--workspace_path", str(output_path / "dense"),
            "--workspace_format", "COLMAP",
            "--PatchMatchStereo.geom_consistency", "true",
        ]
    )
    _run(
        [
            binary, "stereo_fusion",
            "--workspace_path", str(output_path / "dense"),
            "--workspace_format", "COLMAP",
            "--input_type", "geometric",
            "--output_path", str(output_path / "dense/fused.ply"),
        ]
    )
    shutil.copy(
        output_path / "dense/fused.ply", output_path / "sparse/0/points3D.ply"
    )
    elapsed = time() - start_time
    (output_path / "runtime.json").write_text(json.dumps({"runtime": elapsed}))
    return elapsed


def flowmap_flow_resolution(
    original_shape: tuple[int, int], cfg: CroppingCfg
) -> tuple[int, int]:
    """The resolution at which FlowMap's flow network sees the images
    (`run_both_at_flowmap_resolution.py:43-46`): the model image shape from
    the cropping config, times the flow scale multiplier."""
    return tuple(
        dim * cfg.flow_scale_multiplier
        for dim in get_image_shape(original_shape, cfg)
    )


def resize_images_for_flowmap(
    input_path: Path, output_path: Path, cfg: CroppingCfg
) -> tuple[int, int]:
    """Resize every image in input_path to FlowMap's flow resolution
    (`run_both_at_flowmap_resolution.py:34-48`). Returns the original
    (h, w) so metadata can be rescaled back afterwards."""
    from PIL import Image as PILImage

    output_path = Path(output_path)
    output_path.mkdir(exist_ok=True, parents=True)
    original_shape = None
    for image_path in sorted(Path(input_path).iterdir()):
        if not image_path.is_file():
            continue
        image = PILImage.open(image_path)
        original_shape = (image.height, image.width)
        h, w = flowmap_flow_resolution(original_shape, cfg)
        image.resize((w, h), PILImage.LANCZOS).save(output_path / image_path.name)
    if original_shape is None:
        raise FileNotFoundError(f"no images in {input_path}")
    return original_shape


def rescale_model_metadata(
    sparse_path: Path, original_shape: tuple[int, int]
) -> None:
    """Rewrite a COLMAP model's cameras/images at the original resolution
    (`run_both_at_flowmap_resolution.py:58-66`). Intrinsics are normalized
    in our representation, so this only changes the stored camera width and
    height plus the pixel-space focal/principal values; the 3D points file
    is preserved untouched (`run_both_at_flowmap_resolution.py:75-79`)."""
    sparse_path = Path(sparse_path)
    extrinsics, intrinsics, names = read_colmap_model(sparse_path, reorder=False)
    preserved = {}
    for points_name in ("points3D.bin", "points3D.txt", "points3D.ply"):
        points_file = sparse_path / points_name
        if points_file.exists():
            preserved[points_name] = points_file.read_bytes()
    write_colmap_model(sparse_path, extrinsics, intrinsics, names, original_shape)
    for points_name, data in preserved.items():
        (sparse_path / points_name).write_bytes(data)


def run_both_at_flowmap_resolution(
    input_path: Path,
    output_sparse_path: Path,
    output_dense_path: Path,
    workspace_path: Path,
    cfg: CroppingCfg,
    binary: str = "colmap",
    dense: bool = True,
) -> None:
    """The full apples-to-apples protocol
    (`run_both_at_flowmap_resolution.py:23-94`): COLMAP runs on images at
    FlowMap's working resolution, then its outputs are re-attached to the
    original full-resolution images with rescaled metadata."""
    input_path = Path(input_path)
    workspace_path = Path(workspace_path)

    resized_images_dir = workspace_path / "resized_images"
    original_shape = resize_images_for_flowmap(input_path, resized_images_dir, cfg)

    resized_sparse_dir = workspace_path / "resized_sparse"
    run_sparse(resized_images_dir, resized_sparse_dir, 0, "extreme", "video", binary)

    if dense:
        resized_dense_dir = workspace_path / "resized_dense"
        run_dense(resized_sparse_dir, resized_dense_dir, binary)

    def attach_full_res(src: Path, dst: Path) -> None:
        dst.parent.mkdir(exist_ok=True, parents=True)
        shutil.copytree(src, dst)
        shutil.rmtree(dst / "images")
        shutil.copytree(input_path, dst / "images")
        rescale_model_metadata(dst / "sparse/0", original_shape)

    attach_full_res(resized_sparse_dir, Path(output_sparse_path))
    if dense:
        dst = Path(output_dense_path)
        attach_full_res(resized_dense_dir, dst)
        shutil.rmtree(dst / "dense/images")
        shutil.copytree(input_path, dst / "dense/images")
        rescale_model_metadata(dst / "dense/sparse", original_shape)
