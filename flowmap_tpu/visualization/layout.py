"""Image layout utilities: concatenation, borders, labels.

Parity: `flowmap/visualization/layout.py:85-262` (hcat/vcat with alignment
and gaps, add_border, add_label). Host-side NumPy + PIL; images are
(3, h, w) float arrays in [0, 1].
"""

from __future__ import annotations

from typing import Literal

import numpy as np

Alignment = Literal["start", "center", "end"]


def _pad_to(image: np.ndarray, h: int, w: int, align: Alignment, axis_pad) -> np.ndarray:
    _, ih, iw = image.shape
    dh, dw = h - ih, w - iw

    def split(d):
        if align == "start":
            return 0, d
        if align == "end":
            return d, 0
        return d // 2, d - d // 2

    top, bottom = split(dh)
    left, right = split(dw)
    return np.pad(
        image,
        ((0, 0), (top, bottom), (left, right)),
        constant_values=1.0,
    )


def hcat(*images: np.ndarray, align: Alignment = "start", gap: int = 8) -> np.ndarray:
    """Concatenate horizontally with white gaps."""
    h = max(im.shape[1] for im in images)
    padded = [_pad_to(im, h, im.shape[2], align, 1) for im in images]
    spacer = np.ones((3, h, gap), np.float32)
    out = []
    for i, im in enumerate(padded):
        if i:
            out.append(spacer)
        out.append(im)
    return np.concatenate(out, axis=2)


def vcat(*images: np.ndarray, align: Alignment = "start", gap: int = 8) -> np.ndarray:
    """Concatenate vertically with white gaps."""
    w = max(im.shape[2] for im in images)
    padded = [_pad_to(im, im.shape[1], w, align, 2) for im in images]
    spacer = np.ones((3, gap, w), np.float32)
    out = []
    for i, im in enumerate(padded):
        if i:
            out.append(spacer)
        out.append(im)
    return np.concatenate(out, axis=1)


def add_border(image: np.ndarray, border: int = 8, color: float = 1.0) -> np.ndarray:
    return np.pad(
        image,
        ((0, 0), (border, border), (border, border)),
        constant_values=color,
    )


def add_label(image: np.ndarray, label: str, font_size: int = 16) -> np.ndarray:
    """Render a text label above an image (PIL default font)."""
    from PIL import Image, ImageDraw

    _, h, w = image.shape
    band = max(font_size + 6, 18)
    canvas = Image.new("RGB", (w, band), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)
    draw.text((4, 2), label, fill=(0, 0, 0))
    label_array = np.asarray(canvas, np.float32).transpose(2, 0, 1) / 255.0
    return np.concatenate([label_array, image], axis=1)
