"""Image conversion and save/load helpers.

Parity: `flowmap/misc/image_io.py` — float CHW/HWC tensor <-> uint8 images,
matplotlib figure capture, PNG save/load.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def prep_image(image: np.ndarray) -> np.ndarray:
    """Float image (3,h,w) / (h,w,3) / (h,w) in [0,1] -> uint8 HWC."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[..., None].repeat(3, -1)
    elif image.ndim == 3 and image.shape[0] in (1, 3, 4):
        image = image.transpose(1, 2, 0)
    if image.shape[-1] == 1:
        image = image.repeat(3, -1)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)
    return image[..., :3]


def save_image(image: np.ndarray, path: Path) -> None:
    Path(path).parent.mkdir(exist_ok=True, parents=True)
    Image.fromarray(prep_image(image)).save(path)


def load_image(path: Path) -> np.ndarray:
    """PNG/JPEG -> float32 (3, h, w) in [0, 1]."""
    array = np.asarray(Image.open(path), np.float32)
    if array.ndim == 2:
        array = array[..., None].repeat(3, -1)
    return array[..., :3].transpose(2, 0, 1) / 255.0


def fig_to_image(fig) -> np.ndarray:
    """Matplotlib figure -> float32 HWC image in [0, 1]."""
    fig.canvas.draw()
    image = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return image.astype(np.float32) / 255.0
