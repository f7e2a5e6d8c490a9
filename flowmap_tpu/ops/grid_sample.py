"""Differentiable bilinear grid sampling with PyTorch semantics.

The reference leans on `torch.nn.functional.grid_sample` in four places
(`flowmap/model/projection.py:235,266`, `flowmap/model/backbone/backbone_midas.py:120`,
`flowmap/flow/flow_predictor.py:70`), always with `mode="bilinear"`,
`align_corners=False`, and padding "border" or "zeros". ATE parity depends on
bit-matching those conventions, so this module reimplements them exactly:

- grid values in [-1, 1]; unnormalization x_pix = ((x + 1) * W - 1) / 2
  (half-pixel centers).
- "border": corner indices clamped into the image.
- "zeros": out-of-bounds corners contribute zero.

The sample is expressed as a flat `take` of the four corners plus a lerp —
XLA lowers this to vectorized dynamic-gathers; a Pallas gather kernel can be
swapped in underneath without changing call sites. Gradients flow to both the
input image and the sampling grid (needed: the model backpropagates through
flow-displaced sampling coordinates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float


# Above this many bytes per corner-gather temp, sampling is chunked through
# `lax.map` so XLA never materializes all four corner tensors at once (the
# MiDaS feature warp at reference scale would otherwise peak >10 GB of HBM
# temps in the backward pass).
_CHUNK_BYTES = 192 * 1024 * 1024


def grid_sample_2d(
    input: Float[Array, "n c h w"],
    grid: Float[Array, "n hg wg 2"],
    padding_mode: str = "border",
) -> Float[Array, "n c hg wg"]:
    """Bilinear sample `input` at `grid` locations ([-1, 1], xy order)."""
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    n, c, h, w = input.shape
    _, hg, wg, _ = grid.shape

    corner_bytes = n * hg * wg * c * 4
    if corner_bytes > _CHUNK_BYTES:
        points = grid.reshape(n, hg * wg, 2)
        num_chunks = -(-corner_bytes // _CHUNK_BYTES)
        total = hg * wg
        chunk = -(-total // num_chunks)
        padded = chunk * num_chunks
        points = jnp.pad(points, ((0, 0), (0, padded - total), (0, 0)))
        chunks = points.reshape(n, num_chunks, chunk, 2).transpose(1, 0, 2, 3)
        out = jax.lax.map(
            lambda xy: _grid_sample_direct(input, xy[:, :, None], padding_mode),
            chunks,
        )  # (num_chunks, n, c, chunk, 1)
        out = out[..., 0].transpose(1, 2, 0, 3).reshape(n, c, padded)
        return out[..., :total].reshape(n, c, hg, wg)

    return _grid_sample_direct(input, grid, padding_mode)


def _grid_sample_direct(
    input: Float[Array, "n c h w"],
    grid: Float[Array, "n hg wg 2"],
    padding_mode: str,
) -> Float[Array, "n c hg wg"]:
    n, c, h, w = input.shape
    _, hg, wg, _ = grid.shape

    # Unnormalize to pixel coordinates (align_corners=False).
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    # Gather corners CHANNELS-LAST: each descriptor moves a contiguous
    # c-vector row of the (h*w, c) table instead of a single element — on TPU
    # this vectorizes the gather (and its scatter-add transpose in the
    # backward pass) over the lane dimension, which is the difference between
    # a bandwidth-bound warp and a scalar-bound one.
    flat = input.transpose(0, 2, 3, 1).reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, hg * wg)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(n, hg, wg, c)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    if padding_mode == "zeros":
        # Zero the contribution of any corner that lies outside the image.
        def in_bounds(yi, xi):
            return (
                (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            ).astype(input.dtype)[..., None]

        v00 = v00 * in_bounds(y0i, x0i)
        v01 = v01 * in_bounds(y0i, x1i)
        v10 = v10 * in_bounds(y1i, x0i)
        v11 = v11 * in_bounds(y1i, x1i)

    tx = tx[..., None]
    ty = ty[..., None]
    top = v00 * (1.0 - tx) + v01 * tx
    bottom = v10 * (1.0 - tx) + v11 * tx
    out = top * (1.0 - ty) + bottom * ty  # (n, hg, wg, c)
    return out.transpose(0, 3, 1, 2)


def bilinear_onehot_weights(
    coords: Float[Array, "*b p"],
    size: int,
    padding_mode: str,
    dtype,
) -> Float[Array, "*b p size"]:
    """One-hot-pair bilinear weight matrix along one axis.

    W[..., p, i] = (1 - t) * 1[i == floor(c_p)] + t * 1[i == floor(c_p) + 1]
    for pixel coordinates c_p, with "border" clamping both corners into range
    (coincident corners sum their weights, matching the gather form exactly)
    and "zeros" dropping out-of-range corners (no index matches).
    """
    c0 = jnp.floor(coords)
    t = (coords - c0)[..., None]
    c0i = c0.astype(jnp.int32)
    c1i = c0i + 1
    if padding_mode == "border":
        c0i = jnp.clip(c0i, 0, size - 1)
        c1i = jnp.clip(c1i, 0, size - 1)
    idx = jnp.arange(size, dtype=jnp.int32)
    w0 = (idx == c0i[..., None]).astype(dtype)
    w1 = (idx == c1i[..., None]).astype(dtype)
    # Interpolate in the coords dtype (full-precision t), then honor the
    # REQUESTED dtype: without the cast, f32 coords silently promote the
    # result to f32 even when the caller asked for bf16 weights.
    return (w0 * (1.0 - t) + w1 * t).astype(dtype)


def grid_sample_points(
    input: Float[Array, "n c h w"],
    xy: Float[Array, "n p 2"],
    padding_mode: str = "border",
) -> Float[Array, "n c p"]:
    """Sample at a flat list of normalized [0,1] xy points (convenience wrapper).

    Equivalent to `grid_sample_2d(input, xy * 2 - 1)` with a (p, 1) grid, i.e.
    the reference's recurring `F.grid_sample(..., rearrange(xy * 2 - 1, ...))`
    pattern in `projection.py:235-241,266-272`.

    TPU: formulated as SEPARABLE ONE-HOT MATMULS — out = Wy ∘ (Wx ⊗ img) with
    Wx/Wy the one-hot-pair bilinear weight matrices. TPUs have no fast general
    gather (the batched per-row take form with tiny channel counts faulted
    the v5e runtime outright, see docs/TPU_FAULT_NOTES.md) and no fast
    scatter (the gather's transpose), but they have very fast matmuls, and a
    matmul's transpose is a matmul. Every call site samples at coordinates
    that carry no gradient (flow/track supervision is data), so the backward
    is exactly the transposed contraction. Exact bilinear semantics for both
    padding modes, including coincident clamped corners.
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    n, c, h, w = input.shape

    x = xy[..., 0] * w - 0.5
    y = xy[..., 1] * h - 0.5
    wx = bilinear_onehot_weights(x, w, padding_mode, input.dtype)  # (n, p, w)
    wy = bilinear_onehot_weights(y, h, padding_mode, input.dtype)  # (n, p, h)

    img = input.transpose(0, 2, 3, 1)  # (n, h, w, c)
    rows = jnp.einsum("npx,nyxc->npyc", wx, img)  # contract x on the MXU
    out = jnp.einsum("npy,npyc->npc", wy, rows)  # weighted row mix
    return out.transpose(0, 2, 1)
