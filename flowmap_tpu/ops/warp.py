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

import jax
import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float


def radius_for_flows(flow_y: np.ndarray, height: int, margin: int = 1) -> int:
    """Static vertical radius covering a concrete flow field (host-side)."""
    max_dy = float(np.max(np.abs(np.asarray(flow_y)))) * height
    return int(np.ceil(max_dy)) + margin


def _hit(d):
    # max(0, 1 - |d|): exact one-hot for integer-valued f32 deltas.
    return jnp.maximum(1.0 - jnp.abs(d), 0.0)


def _shift_sample_params(grid, h, w):
    """Pixel-space interpolation parameters for the shift-window stencil."""
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    # Integer-valued (f32) offset of the floor corner from the output pixel.
    oxf = x0 - jnp.arange(w, dtype=x0.dtype)[None, None, :]
    oyf = y0 - jnp.arange(h, dtype=y0.dtype)[None, :, None]
    return oxf, tx, oyf, ty


def _shift_weights(oxf, tx, oyf, ty, ry, rx):
    wy = [
        ((1.0 - ty) * _hit(oyf - sy) + ty * _hit(oyf - sy + 1.0))
        for sy in range(-ry, ry + 2)
    ]
    wx = [
        ((1.0 - tx) * _hit(oxf - sx) + tx * _hit(oxf - sx + 1.0))
        for sx in range(-rx, rx + 2)
    ]
    return wy, wx


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_bilinear_shifts(
    input_nhwc: Float[Array, "n h w c"],
    grid: Float[Array, "n h w 2"],
    radius_y: int,
    radius_x: int,
) -> Float[Array, "n h w c"]:
    """Bilinear displacement warp as a static shift-window stencil (VPU).

    torch grid_sample(zeros, align_corners=False) semantics, restricted to
    displacements within (radius_y, radius_x) pixels (callers size the radii
    from the actual flow field). Each output pixel's 4 bilinear taps are
    covered by a (2*radius_y + 2) x (2*radius_x + 2) window of STATICALLY
    shifted image slices weighted by arithmetic one-hots — pure elementwise
    math and pads/slices, which XLA fuses into one stencil loop. No gathers,
    no scatters, no per-row matmuls: at the small radii of the
    half-resolution correspondence-weight path this replaces an 84 ms/step
    pair of Pallas warp kernels (reference-scale bench).

    custom_vjp: the backward w.r.t. the features is hand-written in the SAME
    shifted-slice stencil form (autodiff's transposed slice-accumulation
    materializes one 280 MB temp per tap — OOM at reference scale). The
    sampling grid carries NO gradient (frozen-flow use; its cotangent is
    zero), exactly like the Pallas `warp_features` op.
    """
    return _shifts_forward(input_nhwc, grid, radius_y, radius_x)


def _shifts_forward(input_nhwc, grid, ry, rx):
    n, h, w, c = input_nhwc.shape
    oxf, tx, oyf, ty = _shift_sample_params(grid, h, w)
    wy, wx = _shift_weights(oxf, tx, oyf, ty, ry, rx)

    # Out-of-image corners land in the zero padding, so "zeros" padding
    # needs no explicit masking.
    padded = jnp.pad(input_nhwc, ((0, 0), (ry, ry + 1), (rx, rx + 1), (0, 0)))
    acc = jnp.zeros((n, h, w, c), dtype=jnp.float32)
    for iy, sy in enumerate(range(-ry, ry + 2)):
        for ix, sx in enumerate(range(-rx, rx + 2)):
            wt = (wy[iy] * wx[ix]).astype(input_nhwc.dtype)
            tap = jax.lax.slice(
                padded,
                (0, sy + ry, sx + rx, 0),
                (n, sy + ry + h, sx + rx + w, c),
            )
            acc = acc + (wt[..., None] * tap).astype(jnp.float32)
    return acc.astype(input_nhwc.dtype)


def _shifts_fwd(input_nhwc, grid, ry, rx):
    dtype_token = jnp.zeros((0,), input_nhwc.dtype)
    return _shifts_forward(input_nhwc, grid, ry, rx), (grid, dtype_token)


def _shifts_bwd(ry, rx, residuals, g):
    """d_in[u, v] = sum_taps (wy_sy * wx_sx * g)[u - sy, v - sx].

    Written as the forward's mirror image: pad the cotangent and the weight
    FIELDS once, then accumulate shifted elementwise products — one fusable
    stencil, no transposed-slice temps. Zero-padded g zeroes every
    out-of-range term, so the weight fields need no sentinel padding.
    """
    grid, dtype_token = residuals
    dtype = dtype_token.dtype
    n, h, w, _ = grid.shape
    oxf, tx, oyf, ty = _shift_sample_params(grid, h, w)

    pad2 = ((0, 0), (ry + 1, ry), (rx + 1, rx))
    g = g.astype(jnp.float32)
    gp = jnp.pad(g, pad2 + ((0, 0),))
    typ = jnp.pad(ty, pad2)
    oyp = jnp.pad(oyf, pad2)
    txp = jnp.pad(tx, pad2)
    oxp = jnp.pad(oxf, pad2)

    acc = jnp.zeros((n, h, w, g.shape[-1]), dtype=jnp.float32)
    for sy in range(-ry, ry + 2):
        for sx in range(-rx, rx + 2):
            # Slice at offset (-sy, -sx) relative to the padded origin.
            start = (0, ry + 1 - sy, rx + 1 - sx)
            sl = lambda a, extra=0: jax.lax.slice(
                a,
                start + ((0,) if extra else ()),
                (n, start[1] + h, start[2] + w) + ((g.shape[-1],) if extra else ()),
            )
            ty_s, oy_s = sl(typ), sl(oyp)
            tx_s, ox_s = sl(txp), sl(oxp)
            wt = (
                (1.0 - ty_s) * _hit(oy_s - sy) + ty_s * _hit(oy_s - sy + 1.0)
            ) * ((1.0 - tx_s) * _hit(ox_s - sx) + tx_s * _hit(ox_s - sx + 1.0))
            acc = acc + wt[..., None] * sl(gp, extra=1)
    return acc.astype(dtype), jnp.zeros_like(grid)


warp_bilinear_shifts.defvjp(_shifts_fwd, _shifts_bwd)


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
