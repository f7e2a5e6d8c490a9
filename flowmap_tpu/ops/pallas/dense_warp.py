"""Dense bilinear image warp as one-hot MXU contractions (Pallas TPU kernel).

Problem: warping a full-resolution image by a *data-dependent, unbounded*
displacement field (the GMFlow consistency mask samples the target video at
flow-displaced positions — reference `flow/flow_predictor.py:82-103` /
`common.py:compute_consistency_mask`) has no good XLA formulation on TPU.
The bilinear corner gathers move c=3-float rows through a serial gather
unit: measured 1.42 s/step at the pretrain shape (112 pairs x 288x400),
61% of the whole step, identical for take_along_axis / flat-take /
channel-padded variants (scripts in round-5 log). The windowed warp
kernels (`warp_kernel.py`, `shift_warp.py`) need a static displacement
bound, which in-step flow does not have.

TPU-first reformulation: the whole (c, h, w) image fits VMEM at these
shapes (<= ~2 MB), so each program block of P output pixels builds its
bilinear pair-weight matrices on the fly from an iota comparison (zero
HBM traffic) and contracts them against the resident image on the MXU.

Layout (round-5 correction): the kernel is TRANSPOSED so the pixel axis P
rides the LANES end to end. The first formulation carried coordinates as
(n, total, 2) and weights as (P, size); the trailing dim 2 sat on lanes,
so every surrounding pad/elementwise op ran on ~64x-padded tiles (126 of
128 lanes wasted) — measured 80 ms/step of pads + pixel-coordinate
fusions at the pretrain shape that existed only because of layout. Now
coordinates travel as (n, 2, total) (planar x / y rows, lanes dense) and
the kernel computes

    tmp_c[y, p] = sum_x img_c[y, x] * WX[x, p]      (MXU, per channel)
    out_c[p]    = sum_y WY[y, p] * tmp_c[y, p]      (VPU sublane reduce)

with WX (w, P) / WY (h, P) built by comparing a (size, P) iota row-index
against the lane vector of pixel coordinates. The image stays in its
native (c, h, w) layout (no host-side transpose).

This trades O(p*c) gather traffic for O(p*h*w*c) MXU FLOPs — exactly the
"TPUs have no fast gather but very fast matmuls" trade `grid_sample_points`
already makes for sparse points, extended to dense grids by keeping the
one-hot blocks VMEM-transient (materialized, a (p, w) one-hot for a dense
grid would be tens of GB). ~85 GFLOP/pair at the mask shape -> tens of ms
against the gather's 1.4 s.

Exactness: one-hot weights are {0, 1-t, t}; each output sums exactly two
products per axis, so there is no accumulation error. The dot runs with
f32 accumulation; `compute_dtype` controls the rounding of the image and
the interpolation weights entering the MXU (float32 by default, which this
image's MXU path rounds to bf16-pair precision like every other default
matmul — see docs/MOSAIC_NOTES.md "Precision semantics").

Forward-only by design: every caller warps w.r.t. stop-gradient flow and
feeds a stop-gradient mask. Taking a gradient through it raises.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

from . import runtime as _rt

# Pixels per program block (the lane axis of every in-kernel temporary).
# 1024 keeps the weight matrices + f32 tmp a few MB; total VMEM at the
# mask shape (c=3, 288x400): image 1.4 MB (x2 buffering) + WX (400, 1024)
# + WY/tmp (288, 1024).
_BLOCK_P = 1024
_VMEM_LIMIT_BYTES = 13 * 1024 * 1024


def _kernel(img_ref, xy_ref, out_ref, *, h, w, padding_mode):
    """img: (1, c, h, w) resident; xy: (1, 2, P) planar coords; out: (1, c, P)."""
    x = xy_ref[0, 0:1, :]  # (1, P)
    y = xy_ref[0, 1:2, :]
    c = img_ref.shape[1]
    p = xy_ref.shape[2]

    def onehot_pair(coord, size):
        """(size, P) bilinear pair weights with border clamp / zeros drop."""
        c0 = jnp.floor(coord)
        t = coord - c0  # (1, P)
        i0 = c0.astype(jnp.int32)
        i1 = i0 + 1
        idx = jax.lax.broadcasted_iota(jnp.int32, (size, p), 0)
        if padding_mode == "border":
            w0 = (idx == jnp.clip(i0, 0, size - 1)).astype(jnp.float32)
            w1 = (idx == jnp.clip(i1, 0, size - 1)).astype(jnp.float32)
        else:  # zeros: out-of-range corners contribute nothing
            w0 = (idx == i0).astype(jnp.float32)
            w1 = (idx == i1).astype(jnp.float32)
        return w0 * (1.0 - t) + w1 * t

    img_dtype = img_ref.dtype
    wx = onehot_pair(x, w).astype(img_dtype)  # (w, P)
    wy = onehot_pair(y, h)  # (h, P) f32
    for ch in range(c):
        tmp = jax.lax.dot_general(
            img_ref[0, ch],
            wx,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (h, P)
        out_ref[0, ch, :] = jnp.sum(wy * tmp, axis=0)


def _xla_fallback(images, px, py, padding_mode):
    """Flat-take formulation (CPU/non-TPU correctness path)."""
    n, c, h, w = images.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = (px - x0)[..., None]
    ty = (py - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = images.transpose(0, 2, 3, 1).reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w)).reshape(
        (n,) + (1,) * (px.ndim - 1)
    )

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = jnp.take(flat, (base + yc * w + xc).reshape(-1), axis=0)
        v = v.reshape(*px.shape, c)
        if padding_mode == "zeros":
            inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            v = v * inb[..., None].astype(v.dtype)
        return v

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1.0 - tx) + v01 * tx
    bottom = v10 * (1.0 - tx) + v11 * tx
    out = top * (1.0 - ty) + bottom * ty
    return jnp.moveaxis(out, -1, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dense_warp_bilinear_planar(
    images: Float[Array, "n c h w"],
    px: Float[Array, "n hg wg"],
    py: Float[Array, "n hg wg"],
    padding_mode: str = "zeros",
    compute_dtype=jnp.float32,
) -> Float[Array, "n c hg wg"]:
    """Bilinear-sample `images` at absolute PIXEL coordinates given as
    PLANAR x / y maps (align_corners=False convention: valid centers in
    [-0.5, size-0.5]). Handles arbitrary (unbounded) displacements.

    The planar entry is the fast path: coordinates stay lane-dense
    ((n, 2, total)) all the way into the kernel, so the producer's
    elementwise work and the block padding run on full tiles. Forward-only
    (custom_vjp that raises) — callers warp by stop-gradient flow.
    """
    return _dense_warp_impl(images, px, py, padding_mode, compute_dtype)


def _dense_warp_impl(images, px, py, padding_mode, compute_dtype):
    from jax.experimental import pallas as pl

    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    n, c, h, w = images.shape
    _, hg, wg = px.shape

    def lanes(v):  # lane-tile padding to 128
        return -(-v // 128) * 128

    def sub(v):  # sublane-tile padding to 8
        return -(-v // 8) * 8

    img_bytes = c * sub(h) * lanes(w) * 4
    # In-kernel temporaries (not pipelined): WX (w, P) + WY/tmp (h, P) f32.
    temp_bytes = 4 * _BLOCK_P * (sub(w) + 2 * sub(h))
    usable = (
        _rt.kernels_enabled()
        and c <= 8
        and 2 * img_bytes + temp_bytes < _VMEM_LIMIT_BYTES
    )
    if not usable:
        return _xla_fallback(images, px, py, padding_mode)

    total = hg * wg
    padded = -(-total // _BLOCK_P) * _BLOCK_P
    # (n, 2, total): planar rows, pixel axis on lanes — padding and the
    # kernel's entry DMA run on dense tiles (the round-5 layout fix).
    coords = jnp.stack(
        [px.reshape(n, total), py.reshape(n, total)], axis=1
    ).astype(jnp.float32)
    if padded != total:
        # Padded coords sample (0,0) harmlessly; columns are sliced off below.
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, padded - total)))
    num_blocks = padded // _BLOCK_P

    img = images.astype(compute_dtype)  # native (c, h, w) layout

    kernel = functools.partial(_kernel, h=h, w=w, padding_mode=padding_mode)
    out = _rt.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, padded), jnp.float32),
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, _BLOCK_P), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, c, _BLOCK_P), lambda i, j: (i, 0, j)),
    )(img, coords)
    return out[:, :, :total].reshape(n, c, hg, wg)


def _fwd(images, px, py, padding_mode, compute_dtype):
    return (
        dense_warp_bilinear_planar(images, px, py, padding_mode, compute_dtype),
        None,
    )


def _bwd(padding_mode, compute_dtype, residual, g):
    raise NotImplementedError(
        "dense_warp_bilinear is forward-only (consistency-mask path; warp "
        "coordinates and output are stop-gradient by construction)"
    )


dense_warp_bilinear_planar.defvjp(_fwd, _bwd)


def dense_warp_bilinear(
    images: Float[Array, "n c h w"],
    grid_xy: Float[Array, "n hg wg 2"],
    padding_mode: str = "zeros",
    compute_dtype=jnp.float32,
) -> Float[Array, "n c hg wg"]:
    """Packed-coordinate convenience entry: `grid_xy` in (x, y) pixel
    coordinates, trailing axis 2. Equivalent to
    `grid_sample_2d(images, grid*2/size - 1, padding_mode)`.

    Prefer :func:`dense_warp_bilinear_planar` in hot paths — a trailing
    (..., 2) coordinate array wastes 126 of 128 lanes in every op that
    touches it (see module docstring).
    """
    return dense_warp_bilinear_planar(
        images, grid_xy[..., 0], grid_xy[..., 1], padding_mode, compute_dtype
    )
