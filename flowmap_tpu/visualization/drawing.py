"""Antialiased point/line drawing over images (host-side NumPy).

Parity target: `flowmap/visualization/drawing/{points,lines,rendering}.py` —
an MSAA color-function rasterizer used for paper figures and debug overlays.
This port renders at `supersample`x resolution and box-filters down, which
matches the reference's adaptive-MSAA output for its use cases (solid shapes)
with far simpler code.

Coordinates: world ranges map onto the image exactly like the reference's
`generate_conversions` (`drawing/coordinate_conversion.py:20-45`); default
world space is pixel space.
"""

from __future__ import annotations

from typing import Literal, Optional

import numpy as np

Pair = tuple[float, float]


def _sanitize_vector(value, dim: int) -> np.ndarray:
    array = np.asarray(value, np.float32)
    if array.ndim == 1:
        array = array[None]
    assert array.shape[-1] == dim
    return array


def _conversions(
    shape: tuple[int, int],
    x_range: Optional[Pair],
    y_range: Optional[Pair],
):
    h, w = shape
    x_range = (0.0, float(w)) if x_range is None else x_range
    y_range = (0.0, float(h)) if y_range is None else y_range
    minima = np.asarray([x_range[0], y_range[0]], np.float32)
    maxima = np.asarray([x_range[1], y_range[1]], np.float32)
    wh = np.asarray([w, h], np.float32)

    def world_to_pixel(xy: np.ndarray) -> np.ndarray:
        return (xy - minima) / (maxima - minima) * wh

    return world_to_pixel


def _composite(
    image: np.ndarray,  # (3, h, w)
    rgba_fn,
    supersample: int,
) -> np.ndarray:
    _, h, w = image.shape
    s = supersample
    ys = (np.arange(h * s) + 0.5) / s
    xs = (np.arange(w * s) + 0.5) / s
    xy = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
    rgba = rgba_fn(xy).reshape(h * s, w * s, 4)
    rgba = rgba.reshape(h, s, w, s, 4).mean(axis=(1, 3))
    color = rgba[..., :3].transpose(2, 0, 1)
    alpha = rgba[..., 3][None]
    return image * (1 - alpha) + color * alpha


# ---------------------------------------------------------------------------
# Adaptive-MSAA color-function renderer (`drawing/rendering.py:76-143`)
# ---------------------------------------------------------------------------


def _detect_edge_pixels(rgba: np.ndarray) -> np.ndarray:
    """Batched: pixels whose color differs from any 8-neighbor
    (rendering.py:29-55). rgba: (b, h, w, 4) -> mask (b, h, w)."""
    b, h, w, _ = rgba.shape
    mask = np.zeros((b, h, w), bool)
    horizontal = (rgba[:, :, 1:] != rgba[:, :, :-1]).any(axis=-1)
    mask[:, :, 1:] |= horizontal
    mask[:, :, :-1] |= horizontal
    vertical = (rgba[:, 1:] != rgba[:, :-1]).any(axis=-1)
    mask[:, 1:] |= vertical
    mask[:, :-1] |= vertical
    tlbr = (rgba[:, 1:, 1:] != rgba[:, :-1, :-1]).any(axis=-1)
    mask[:, 1:, 1:] |= tlbr
    mask[:, :-1, :-1] |= tlbr
    trbl = (rgba[:, :-1, 1:] != rgba[:, 1:, :-1]).any(axis=-1)
    mask[:, :-1, 1:] |= trbl
    mask[:, 1:, :-1] |= trbl
    return mask


def _msaa_pass(xy, color_function, scale, subdivision, remaining):
    """xy: (b, h, w, 2) sample locations -> (b, h, w, 4) straight-alpha RGBA
    (the reference's `run_msaa_pass` recursion, rendering.py:76-115)."""
    b, h, w, _ = xy.shape
    rgba = np.asarray(
        color_function(xy.reshape(-1, 2)), np.float32
    ).reshape(b, h, w, 4)
    if remaining <= 0:
        return rgba
    mask = _detect_edge_pixels(rgba)
    if not mask.any():
        return rgba
    sub = (np.stack(
        np.meshgrid(
            np.arange(subdivision, dtype=np.float32) + 0.5,
            np.arange(subdivision, dtype=np.float32) + 0.5,
            indexing="xy",
        ),
        axis=-1,
    ) / subdivision - 0.5) * scale
    fine_xy = xy[mask][:, None, None, :] + sub[None]  # (k, s, s, 2)
    fine = _msaa_pass(
        fine_xy, color_function, scale / subdivision, subdivision, remaining - 1
    )  # (k, s, s, 4)
    color, alpha = fine[..., :3], fine[..., 3:]
    merged_color = (color * alpha).sum(axis=(1, 2)) / (
        alpha.sum(axis=(1, 2)) + 1e-10
    )
    merged_alpha = alpha.mean(axis=(1, 2))
    rgba[mask] = np.concatenate([merged_color, merged_alpha], axis=-1)
    return rgba


def render(
    shape: tuple[int, int],
    color_function,
    subdivision: int = 8,
    num_passes: int = 2,
) -> np.ndarray:
    """Adaptive-MSAA render of an RGBA color function to an (h, w, 4)
    straight-alpha canvas (rendering.py:118-133). Pass 0 samples pixel
    centers; each further pass re-samples only edge pixels on a
    `subdivision`^2 sub-grid and merges with alpha weighting."""
    h, w = shape
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    xy = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)[None]
    return _msaa_pass(xy, color_function, 1.0, subdivision, num_passes)[0]


def render_over_image(
    image: np.ndarray,  # (3, h, w)
    color_function,
    subdivision: int = 8,
    num_passes: int = 1,
) -> np.ndarray:
    """Composite an adaptively-antialiased color function over an image
    (rendering.py:146-167, straight alpha)."""
    _, h, w = image.shape
    overlay = render((h, w), color_function, subdivision, num_passes)
    color = overlay[..., :3].transpose(2, 0, 1)
    alpha = overlay[..., 3][None]
    return image * (1 - alpha) + color * alpha


def draw_points(
    image: np.ndarray,  # (3, h, w)
    points,
    color=(1.0, 1.0, 1.0),
    radius: float = 1.0,
    inner_radius: float = 0.0,
    supersample: int = 2,
    x_range: Optional[Pair] = None,
    y_range: Optional[Pair] = None,
) -> np.ndarray:
    """Draw (rings of) points (`drawing/points.py:13-60`)."""
    points = _sanitize_vector(points, 2)
    color = np.broadcast_to(_sanitize_vector(color, 3), (points.shape[0], 3))
    world_to_pixel = _conversions(image.shape[1:], x_range, y_range)
    points = world_to_pixel(points)

    def rgba_fn(xy: np.ndarray) -> np.ndarray:
        delta = xy[:, None] - points[None]  # (s, p, 2)
        norm = np.linalg.norm(delta, axis=-1)
        mask = (norm >= inner_radius) & (norm <= radius)
        top = np.argmax(mask * np.arange(points.shape[0]), axis=1)
        rgba = np.concatenate(
            [color[top], mask.any(axis=1).astype(np.float32)[:, None]], axis=-1
        )
        return rgba

    return _composite(image, rgba_fn, supersample)


def draw_lines(
    image: np.ndarray,  # (3, h, w)
    start,
    end,
    color=(1.0, 1.0, 1.0),
    width: float = 1.0,
    cap: Literal["butt", "round", "square"] = "round",
    supersample: int = 2,
    x_range: Optional[Pair] = None,
    y_range: Optional[Pair] = None,
) -> np.ndarray:
    """Draw capped line segments (`drawing/lines.py:13-90`)."""
    start = _sanitize_vector(start, 2)
    end = _sanitize_vector(end, 2)
    n = max(start.shape[0], end.shape[0])
    start = np.broadcast_to(start, (n, 2))
    end = np.broadcast_to(end, (n, 2))
    color = np.broadcast_to(_sanitize_vector(color, 3), (n, 3))
    world_to_pixel = _conversions(image.shape[1:], x_range, y_range)
    start = world_to_pixel(start)
    end = world_to_pixel(end)

    def rgba_fn(xy: np.ndarray) -> np.ndarray:
        delta = end - start  # (l, 2)
        delta_norm = np.linalg.norm(delta, axis=-1, keepdims=True)
        u_delta = delta / np.maximum(delta_norm, 1e-12)
        indicator = xy[None] - start[:, None]  # (l, s, 2)
        extra = 0.5 * width if cap == "square" else 0.0
        parallel = np.einsum("ld,lsd->ls", u_delta, indicator)
        parallel_inside = (parallel <= delta_norm + extra) & (parallel > -extra)
        perpendicular = indicator - parallel[..., None] * u_delta[:, None]
        perpendicular_inside = np.linalg.norm(perpendicular, axis=-1) < 0.5 * width
        inside = parallel_inside & perpendicular_inside
        if cap == "round":
            inside |= np.linalg.norm(indicator, axis=-1) < 0.5 * width
            inside |= np.linalg.norm(xy[None] - end[:, None], axis=-1) < 0.5 * width
        top = np.argmax(inside * np.arange(n)[:, None], axis=0)
        rgba = np.concatenate(
            [color[top], inside.any(axis=0).astype(np.float32)[:, None]], axis=-1
        )
        return rgba

    return _composite(image, rgba_fn, supersample)
