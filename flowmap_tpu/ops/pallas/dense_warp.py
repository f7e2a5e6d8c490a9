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

TPU-first reformulation: the whole (c, w, h) image fits VMEM at these
shapes (<= ~2 MB), so each program block of P output pixels builds its
bilinear x-weight PAIR matrix (P, w) on the fly from an iota comparison
(zero HBM traffic), contracts it against the resident image on the MXU,
and reduces the y-pair weights on the VPU:

    tmp_c[p, y] = sum_x WX[p, x] * img_c[x, y]      (MXU, per channel)
    out_c[p]    = sum_y WY[p, y] * tmp_c[p, y]      (VPU)

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

# Pixels per program block. 1024 keeps the in-kernel weight matrices +
# f32 tmp a few MB; total VMEM at the mask shape (c=3, 288x400): image
# 1.4 MB (x2 buffering) + WX (1024, 400) + WY/tmp (1024, 288).
_BLOCK_P = 1024
_VMEM_LIMIT_BYTES = 13 * 1024 * 1024


def _kernel(img_ref, xy_ref, out_ref, *, h, w, padding_mode):
    """img: (1, c, w, h) resident; xy: (1, P, 2) pixel coords; out: (1, c, P)."""
    xy = xy_ref[0]
    x = xy[:, 0:1]  # (P, 1)
    y = xy[:, 1:2]
    c = img_ref.shape[1]
    p = xy.shape[0]

    def onehot_pair(coord, size):
        """(P, size) bilinear pair weights with border clamp / zeros drop."""
        c0 = jnp.floor(coord)
        t = coord - c0  # (P, 1)
        i0 = c0.astype(jnp.int32)
        i1 = i0 + 1
        idx = jax.lax.broadcasted_iota(jnp.int32, (p, size), 1)
        if padding_mode == "border":
            w0 = (idx == jnp.clip(i0, 0, size - 1)).astype(jnp.float32)
            w1 = (idx == jnp.clip(i1, 0, size - 1)).astype(jnp.float32)
        else:  # zeros: out-of-range corners contribute nothing
            w0 = (idx == i0).astype(jnp.float32)
            w1 = (idx == i1).astype(jnp.float32)
        return w0 * (1.0 - t) + w1 * t

    img_dtype = img_ref.dtype
    wx = onehot_pair(x, w).astype(img_dtype)  # (P, w)
    wy = onehot_pair(y, h)  # (P, h) f32
    for ch in range(c):
        tmp = jax.lax.dot_general(
            wx,
            img_ref[0, ch],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, h)
        out_ref[0, ch, :] = jnp.sum(wy * tmp, axis=1)


def _xla_fallback(images, grid_xy, padding_mode):
    """Flat-take formulation (CPU/non-TPU correctness path)."""
    n, c, h, w = images.shape
    x = grid_xy[..., 0]
    y = grid_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = images.transpose(0, 2, 3, 1).reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w)).reshape(
        (n,) + (1,) * (grid_xy.ndim - 2)
    )

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = jnp.take(flat, (base + yc * w + xc).reshape(-1), axis=0)
        v = v.reshape(*grid_xy.shape[:-1], c)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_warp_bilinear(
    images: Float[Array, "n c h w"],
    grid_xy: Float[Array, "n hg wg 2"],
    padding_mode: str = "zeros",
    compute_dtype=jnp.float32,
) -> Float[Array, "n c hg wg"]:
    """Bilinear-sample `images` at absolute PIXEL coordinates `grid_xy`
    (x, y order, align_corners=False convention: valid centers in
    [-0.5, size-0.5]). Handles arbitrary (unbounded) displacements.

    Equivalent to `grid_sample_2d(images, grid*2/size - 1, padding_mode)`;
    see module docstring for when to use which. Forward-only (custom_vjp
    that raises) — callers warp by stop-gradient flow.
    """
    return _dense_warp_impl(images, grid_xy, padding_mode, compute_dtype)


def _dense_warp_impl(images, grid_xy, padding_mode, compute_dtype):
    from jax.experimental import pallas as pl

    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    n, c, h, w = images.shape
    _, hg, wg, _ = grid_xy.shape

    def lanes(v):  # lane-tile padding to 128
        return -(-v // 128) * 128

    img_bytes = c * w * lanes(h) * 4
    # In-kernel temporaries (not pipelined): WX (P, w) + WY/tmp (P, h) f32.
    temp_bytes = 4 * _BLOCK_P * (lanes(w) + 2 * lanes(h))
    usable = (
        _rt.kernels_enabled()
        and c <= 8
        and 2 * img_bytes + temp_bytes < _VMEM_LIMIT_BYTES
    )
    if not usable:
        return _xla_fallback(images, grid_xy, padding_mode)

    total = hg * wg
    padded = -(-total // _BLOCK_P) * _BLOCK_P
    coords = grid_xy.reshape(n, total, 2).astype(jnp.float32)
    if padded != total:
        # Padded coords sample (0,0) harmlessly; rows are sliced off below.
        coords = jnp.pad(coords, ((0, 0), (0, padded - total), (0, 0)))
    num_blocks = padded // _BLOCK_P

    # (c, w, h) layout so the x-contraction is a plain (P, w) @ (w, h) dot.
    img_cwh = images.transpose(0, 1, 3, 2).astype(compute_dtype)

    kernel = functools.partial(_kernel, h=h, w=w, padding_mode=padding_mode)
    out = _rt.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, padded), jnp.float32),
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec((1, c, w, h), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, _BLOCK_P, 2), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, _BLOCK_P), lambda i, j: (i, 0, j)),
    )(img_cwh, coords)
    return out[:, :, :total].reshape(n, c, hg, wg)


def _fwd(images, grid_xy, padding_mode, compute_dtype):
    return dense_warp_bilinear(images, grid_xy, padding_mode, compute_dtype), None


def _bwd(padding_mode, compute_dtype, residual, g):
    raise NotImplementedError(
        "dense_warp_bilinear is forward-only (consistency-mask path; warp "
        "coordinates and output are stop-gradient by construction)"
    )


dense_warp_bilinear.defvjp(_fwd, _bwd)
