"""ctypes bindings for the native image I/O library (+ PIL fallback).

`native/image_io.cpp` (libjpeg/libpng, threaded) decodes scene frames into
packed float32 CHW batches far faster than per-image PIL. Falls back to PIL
transparently when the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent / "_native" / "libflowmap_io.so"
_lib: Optional[ctypes.CDLL] = None


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fmio_image_shape.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fmio_image_shape.restype = ctypes.c_int
    lib.fmio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fmio_load_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def image_shape(path: Path) -> tuple[int, int]:
    lib = _load_library()
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            return (im.height, im.width)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.fmio_image_shape(str(path).encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"failed to decode {path}")
    return (h.value, w.value)


def load_image_batch(
    paths: list[Path],
    shape: Optional[tuple[int, int]] = None,
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Decode images into (n, 3, h, w) float32 in [0, 1].

    With `shape`, every image is bilinearly resized (half-pixel centers);
    without, all images must share their native shape.
    """
    lib = _load_library()
    if lib is None:
        return _load_image_batch_pil(paths, shape)

    n = len(paths)
    if shape is None:
        shape = image_shape(paths[0])
    h, w = shape
    out = np.empty((n, 3, h, w), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    threads = num_threads or min(os.cpu_count() or 1, 8)
    failures = lib.fmio_load_batch(
        c_paths,
        n,
        h,
        w,
        threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if failures:
        raise IOError(f"{failures} image(s) failed to decode")
    return out


def _load_image_batch_pil(
    paths: list[Path], shape: Optional[tuple[int, int]]
) -> np.ndarray:
    from PIL import Image

    images = []
    for path in paths:
        array = np.asarray(Image.open(path), np.float32)
        if array.ndim == 2:
            array = array[..., None].repeat(3, -1)
        array = array[..., :3].transpose(2, 0, 1) / 255.0
        images.append(array)
    batch = np.stack(images)
    if shape is not None and batch.shape[-2:] != tuple(shape):
        import jax.numpy as jnp

        from ..ops.resize import resize_bilinear

        batch = np.asarray(resize_bilinear(jnp.asarray(batch), tuple(shape)))
    return batch
