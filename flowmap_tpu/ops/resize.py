"""Bilinear image resize with PyTorch `F.interpolate(..., align_corners=False)`
semantics.

The reference resizes videos, flow fields, and masks with non-antialiased
bilinear interpolation (`flowmap/misc/cropping.py:24`,
`flowmap/flow/flow_predictor.py:46,56`, `backbone_midas.py:86`).
`jax.image.resize` antialiases on downsample (scale-aware triangle kernel), so
it does NOT match; instead we sample output pixel centers directly, which is
exactly torch's bilinear: src = (dst + 0.5) * (in / out) - 0.5, corners
clamped to the image (border behavior).
"""

from __future__ import annotations

import jax.numpy as jnp
from jaxtyping import Array, Float

from .grid_sample import grid_sample_2d


def resize_bilinear(
    images: Float[Array, "n c h w"],
    shape: tuple[int, int],
) -> Float[Array, "n c ho wo"]:
    """Resize NCHW images to `shape` = (ho, wo), torch-bilinear semantics."""
    n, c, h, w = images.shape
    ho, wo = shape
    if (h, w) == (ho, wo):
        return images
    # Output pixel centers in normalized [-1, 1] grid_sample coordinates: the
    # half-pixel-centered source coordinate (d + 0.5) * in/out - 0.5 maps to
    # grid value (2 * src + 1) / in - 1 = (2d + 1) / out - 1.
    gx = (2.0 * jnp.arange(wo, dtype=images.dtype) + 1.0) / wo - 1.0
    gy = (2.0 * jnp.arange(ho, dtype=images.dtype) + 1.0) / ho - 1.0
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (ho, wo, 2)
    grid = jnp.broadcast_to(grid[None], (n, ho, wo, 2))
    return grid_sample_2d(images, grid, padding_mode="border")
