"""Gather-free bilinear warp via windowed one-hot matmuls (MXU).

The MiDaS correspondence-weight path warps full-resolution feature maps by
the backward flow (`backbone_midas.py:104-112` in the reference). As a
gather, that op is catastrophically slow on TPU: XLA lowers arbitrary-index
gathers to ~10M descriptors/s, making the warp ~4.6 s/step at reference scale
— 25x the rest of the model combined. TPUs do not have fast general gathers;
they have fast matmuls.

This module reformulates dense bilinear warping as matrix multiplication:

- Column interpolation is EXACT: a per-output-row one-hot-pair matrix
  Wx[j, x] = (1-tx)·1[x=x0] + tx·1[x=x1] (out-of-bounds corners zeroed,
  matching "zeros" padding) contracts against the image rows on the MXU.
- Row interpolation runs over a static vertical window of `2*radius + 2`
  shifted copies (pad + slice, no gathers): each output pixel picks its two
  source rows with (1-ty)/ty weights, zeroed outside the image.

Validity: every sample's vertical displacement |y_sample - i| must be within
`radius`; larger displacements clamp to the window edge (the caller picks
`radius` from the actual flow field — `radius_for_flows` — so this is exact
in practice; the horizontal axis has no such limit).

The backward pass contains only transposed matmuls and elementwise math (the
one-hot construction is piecewise-constant in the indices; grid gradients
flow through tx/ty exactly as in the gather formulation). No scatters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float


def radius_for_flows(flow_y: np.ndarray, height: int, margin: int = 1) -> int:
    """Static vertical radius covering a concrete flow field (host-side)."""
    max_dy = float(np.max(np.abs(np.asarray(flow_y)))) * height
    return int(np.ceil(max_dy)) + margin


def warp_bilinear_matmul(
    input: Float[Array, "n c h w"],
    grid: Float[Array, "n hg wg 2"],
    radius: int = 16,
    pair_chunk: int = 16,
) -> Float[Array, "n c hg wg"]:
    """Bilinear sample with torch grid_sample(zeros, align_corners=False)
    semantics, restricted to |vertical displacement| <= radius.

    Output rows correspond to input rows (hg == h required): the warp is a
    displacement field, which is exactly the correspondence-weight use case.
    """
    n, c, h, w = input.shape
    _, hg, wg, _ = grid.shape
    assert hg == h, "matmul warp assumes row-aligned output (displacement warp)"

    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(x)
    tx = (x - x0)[..., None]  # (n, h, wg, 1)
    x0i = x0.astype(jnp.int32)

    # Column one-hot pair, zero outside [0, w-1] ("zeros" padding in x).
    cols = jnp.arange(w, dtype=jnp.int32)
    onehot0 = (cols == x0i[..., None]).astype(input.dtype)
    onehot1 = (cols == (x0i + 1)[..., None]).astype(input.dtype)
    wx = onehot0 * (1.0 - tx) + onehot1 * tx  # (n, h, wg, w)

    y0 = jnp.floor(y)
    ty = y - y0
    y0i = y0.astype(jnp.int32)
    rows_idx = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    dy0 = jnp.clip(y0i - rows_idx + radius, 0, 2 * radius)  # window slot of y0

    # Vertical "zeros" padding masks.
    in_y0 = (y0i >= 0) & (y0i <= h - 1)
    in_y1 = (y0i + 1 >= 0) & (y0i + 1 <= h - 1)
    w0 = (1.0 - ty) * in_y0.astype(input.dtype)  # weight of window slot dy0
    w1 = ty * in_y1.astype(input.dtype)  # weight of slot dy0 + 1

    x_nhwc = input.transpose(0, 2, 3, 1)  # (n, h, w, c)
    padded = jnp.pad(
        x_nhwc, ((0, 0), (radius, radius + 1), (0, 0), (0, 0))
    )  # (n, h + 2r + 1, w, c)

    # Scan over window slots with a rematerialized body: without remat the
    # backward pass keeps every slot's (n, h, wg, c) matmul output live at
    # once (34 x 745 MB at reference scale — OOM). Recomputing each slot's
    # matmul in the backward costs ~2x warp FLOPs, still negligible.
    import jax

    def slot(out, d):
        shifted = jax.lax.dynamic_slice_in_dim(padded, d, h, axis=1)
        weight = (
            jnp.where(dy0 == d, w0, 0.0) + jnp.where(dy0 + 1 == d, w1, 0.0)
        )[..., None].astype(input.dtype)  # (n, h, wg, 1)
        contrib = jnp.einsum(
            "nhjx,nhxc->nhjc", wx, shifted, preferred_element_type=input.dtype
        )
        return out + weight * contrib, None

    out = jnp.zeros((n, h, wg, c), dtype=input.dtype)
    out, _ = jax.lax.scan(
        jax.checkpoint(slot), out, jnp.arange(2 * radius + 2, dtype=jnp.int32)
    )

    return out.transpose(0, 3, 1, 2)
