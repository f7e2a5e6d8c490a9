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



def _upsample_axis_int(x: Float[Array, "n c h w"], s: int, axis: int):
    """Integer-factor bilinear upsample along `axis` (2 or 3) with
    align_corners=False + border clamp, built from STATIC slices only.

    Gather-free: the backward pass is slicing/padding instead of the
    scatter-adds a coordinate-gather formulation produces — scatters are the
    slowest-compiling and slowest-running ops on TPU, and this path runs on
    the largest tensors in the model (the MiDaS feature upsample).
    """
    import numpy as np

    pad = [(0, 0)] * 4
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    length = x.shape[axis]

    phases = []
    for p in range(s):
        offset = (p + 0.5) / s - 0.5
        i0 = int(np.floor(offset))
        t = offset - i0
        lo = [slice(None)] * 4
        hi = [slice(None)] * 4
        lo[axis] = slice(i0 + 1, i0 + 1 + length)
        hi[axis] = slice(i0 + 2, i0 + 2 + length)
        phases.append(xp[tuple(lo)] * (1.0 - t) + xp[tuple(hi)] * t)
    stacked = jnp.stack(phases, axis=axis + 1)  # (..., length, s, ...)
    new_shape = list(x.shape)
    new_shape[axis] = s * length
    return stacked.reshape(new_shape)


def _downsample_axis_int(x: Float[Array, "n c h w"], s: int, axis: int):
    """Integer-factor bilinear downsample along `axis` (align_corners=False).

    Output i samples source (i + 0.5) * s - 0.5 = s*i + (s-1)/2: a static
    2-tap (odd s: exact center -> 1-tap) interpolation of strided slices.
    """
    length = x.shape[axis] // s
    center = (s - 1) / 2.0
    i0 = int(center)  # floor
    t = center - i0

    def strided(start):
        sl = [slice(None)] * 4
        sl[axis] = slice(start, start + (length - 1) * s + 1, s)
        return x[tuple(sl)]

    if t == 0.0:
        return strided(i0)
    return strided(i0) * (1.0 - t) + strided(i0 + 1) * t


def resize_bilinear(
    images: Float[Array, "n c h w"],
    shape: tuple[int, int],
) -> Float[Array, "n c ho wo"]:
    """Resize NCHW images to `shape` = (ho, wo), torch-bilinear semantics."""
    n, c, h, w = images.shape
    ho, wo = shape
    if (h, w) == (ho, wo):
        return images

    # Integer-factor fast paths (static slices, no gathers — see above).
    out = images
    if ho % h == 0 and wo % w == 0 and (ho // h > 1 or wo // w > 1):
        if ho // h > 1:
            out = _upsample_axis_int(out, ho // h, 2)
        if wo // w > 1:
            out = _upsample_axis_int(out, wo // w, 3)
        return out
    if h % ho == 0 and w % wo == 0 and (h // ho > 1 or w // wo > 1):
        if h // ho > 1:
            out = _downsample_axis_int(out, h // ho, 2)
        if w // wo > 1:
            out = _downsample_axis_int(out, w // wo, 3)
        return out
    # General (non-integer-factor) path: bilinear resize is SEPARABLE with
    # per-axis coordinates shared by every image, so it is two small one-hot
    # matmuls — (ho, h) and (wo, w) pair-weight matrices contracted on the
    # MXU. The previous coordinate-gather formulation cost 516 ms/step in
    # the pretrain trace (flow/mask rescale 288x400 -> 128x192; TPU gathers
    # of short rows are serial-unit-bound — docs/PERF_R5.md); the matmul
    # form is a rounding error by comparison and its backward is the
    # transposed matmul instead of a scatter-add. HIGHEST precision keeps
    # the f32 weights exact (this image's default rounds matmul inputs to
    # bf16 — docs/MOSAIC_NOTES.md).
    import jax

    from .grid_sample import bilinear_onehot_weights

    src_y = (jnp.arange(ho, dtype=jnp.float32) + 0.5) * (h / ho) - 0.5
    src_x = (jnp.arange(wo, dtype=jnp.float32) + 0.5) * (w / wo) - 0.5
    wy = bilinear_onehot_weights(src_y, h, "border", images.dtype)
    wx = bilinear_onehot_weights(src_x, w, "border", images.dtype)
    precision = (
        jax.lax.Precision.HIGHEST
        if images.dtype == jnp.float32
        else None
    )
    rows = jnp.einsum("oy,ncyx->ncox", wy, images, precision=precision)
    return jnp.einsum("px,ncox->ncop", wx, rows, precision=precision)
