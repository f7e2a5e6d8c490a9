"""Pallas TPU kernel: dense bilinear feature warp (forward + feature-grad).

The correspondence-weight path warps (n, c, h, w) feature maps by per-pixel
displacements. All XLA formulations are bandwidth-pathological on TPU:
gathers run at ~10M descriptors/s (4.6 s/step at reference scale) and the
one-hot matmul rewrite re-reads its (n, h, wg, w) selection matrix from HBM
once per window slot (1.3 s/step). This kernel generates the selection
weights in VMEM, so HBM traffic is just features in + outputs out.

Structure: one program per (frame pair, block of output rows). The feature
rows the block can touch ([base - R, base + block + R]) are DMA'd from HBM
into a VMEM scratch (manual async copy — the window overlaps between
programs, which BlockSpec tiling can't express); each output row builds its
column-interpolation matrix (wg x w) from an iota comparison and accumulates
`row_weight_d * (Wx @ F[row + d])` over the 2*radius + 2 window slots on the
MXU.

Gradient: `warp_features` is a custom-vjp op whose backward computes ONLY the
feature cotangent (the sampling grid comes from the precomputed frozen
optical flow and is never differentiated; its cotangent is returned as
zeros). The feature-grad kernel has the transposed structure: per source-row
block, dF[y] += Wx[i]^T @ (row_weight * g[i]) over output rows i in the
window.

Off-TPU the op falls back to the XLA matmul formulation (`ops/warp.py`),
which is numerically identical; parity is tested in interpret mode on CPU
(tests/test_warp_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

from ..warp import warp_bilinear_matmul

_BLOCK_ROWS = 8


def _sample_params(grid, h, w, radius):
    """Per-pixel sample parameters in pixel units (fp32)."""
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return (
        x0.astype(jnp.int32),
        (x - x0).astype(jnp.float32),
        y0.astype(jnp.int32),
        (y - y0).astype(jnp.float32),
    )


def _forward_kernel(
    block, radius, w, x0_ref, tx_ref, y0_ref, ty_ref, f_hbm, out_ref, f_vmem, sem
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window = 2 * radius + 2
    wg = x0_ref.shape[-1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = j * block

    # DMA the row window [base, base + block + window - 1) of the padded
    # features for this pair into VMEM. The features arrive row-flattened
    # ((n, hp*w, c)) so the kernel can take 2D window slices without any
    # in-kernel reshape (Mosaic rejects most vector shape casts).
    copy = pltpu.make_async_copy(
        f_hbm.at[i, pl.ds(base * w, (block + window - 1) * w)], f_vmem, sem
    )
    copy.start()
    copy.wait()

    # One MXU call per output row: a (wg, window*w) weight matrix with the 4
    # bilinear corners one-hot against the FLATTENED window rows, contracted
    # against the flattened scratch. 34 tiny masked dots -> 1 large dot.
    cols = jax.lax.broadcasted_iota(jnp.int32, (wg, window * w), 1)

    for r in range(block):
        x0 = x0_ref[0, r, :][:, None]
        tx = tx_ref[0, r, :][:, None]
        y0 = y0_ref[0, r, :][:, None]
        ty = ty_ref[0, r, :][:, None]

        # Window slot d holds source row (base + r) + d - radius, which is
        # f_vmem row r + d; y0's slot (may fall outside [0, window) -> its
        # flat index falls outside [0, window*w) and matches nothing, which
        # is the vertical zero-padding: padded scratch rows are zero anyway).
        slot0 = y0 - (base + r) + radius

        # Horizontal "zeros" padding: an out-of-image x must be masked to a
        # sentinel, else slot*w + x aliases a neighbouring row's column.
        okx0 = (x0 >= 0) & (x0 <= w - 1)
        okx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
        i00 = jnp.where(okx0, slot0 * w + x0, -1)
        i01 = jnp.where(okx1, slot0 * w + x0 + 1, -1)
        i10 = jnp.where(okx0, (slot0 + 1) * w + x0, -1)
        i11 = jnp.where(okx1, (slot0 + 1) * w + x0 + 1, -1)

        # Arithmetic one-hot (max(0, 1 - |cols - idx|), exact for integer
        # deltas in f32): wide boolean masks trip a Mosaic relayout bug.
        def onehot(idx):
            delta = (cols - idx).astype(jnp.float32)
            return jnp.maximum(1.0 - jnp.abs(delta), 0.0)

        wmat = (
            onehot(i00) * ((1.0 - ty) * (1.0 - tx))
            + onehot(i01) * ((1.0 - ty) * tx)
            + onehot(i10) * (ty * (1.0 - tx))
            + onehot(i11) * (ty * tx)
        ).astype(f_vmem.dtype)

        window_flat = f_vmem[r * w : (r + window) * w]
        acc = jnp.dot(wmat, window_flat, preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def _grad_kernel(
    block,
    radius,
    wg,
    x0_ref,
    tx_ref,
    y0_ref,
    ty_ref,
    g_hbm,
    df_ref,
    g_vmem,
    w_vmem,
    sem,
):
    """Feature cotangent; see module docstring."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window = 2 * radius + 2
    w = df_ref.shape[-2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = j * block

    # Cotangents arrive row-flattened ((n, hp*wg, c)); see forward kernel.
    copy = pltpu.make_async_copy(
        g_hbm.at[i, pl.ds(base * wg, (block + window - 1) * wg)], g_vmem, sem
    )
    copy.start()
    copy.wait()

    # Transposed flattened form: df[y] = W^T_flat(window*wg, w) contracted
    # (dim 0) with g_window_flat(window*wg, c) — one MXU call per source row.
    # The weight matrix is built slot-by-slot into a VMEM scratch (each slot
    # is a (wg, w) lane-iota one-hot, the only 2D orientation Mosaic's
    # layout inference accepts here).
    cols = jax.lax.broadcasted_iota(jnp.int32, (wg, w), 1)

    def hit(delta_int):
        delta = delta_int.astype(jnp.float32)
        return jnp.maximum(1.0 - jnp.abs(delta), 0.0)

    for r in range(block):
        y = base + r  # source row

        def build(d, carry):
            # Contributing output row i_abs = y - radius - 1 + d; with the
            # (radius + 1)-row top padding, padded param row = base + r + d.
            x0 = x0_ref[0, base + r + d, :][:, None]
            tx = tx_ref[0, base + r + d, :][:, None]
            y0 = y0_ref[0, base + r + d, :][:, None]
            ty = ty_ref[0, base + r + d, :][:, None]
            wy = hit(y0 - y) * (1.0 - ty) + hit(y0 - (y - 1)) * ty
            wd = (
                hit(cols - x0) * (wy * (1.0 - tx))
                + hit(cols - (x0 + 1)) * (wy * tx)
            ).astype(w_vmem.dtype)
            w_vmem[pl.ds(d * wg, wg)] = wd
            return carry

        jax.lax.fori_loop(0, window, build, 0)

        g_flat = g_vmem[r * wg : (r + window) * wg]
        acc = jax.lax.dot_general(
            w_vmem[...],
            g_flat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        df_ref[0, r] = acc.astype(df_ref.dtype)


def _run_forward(features_nhwc, x0, tx, y0, ty, radius):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c_in = features_nhwc.shape
    wg = x0.shape[-1]
    window = 2 * radius + 2
    block = _BLOCK_ROWS
    assert h % block == 0, (h, block)

    # DMA slices must be lane-aligned: pad channels to a multiple of 128.
    c = c_in + ((-c_in) % 128)
    hp = h + window - 1
    padded = jnp.pad(
        features_nhwc,
        ((0, 0), (radius, radius + 1), (0, 0), (0, c - c_in)),
    ).reshape(n, hp * w, c)

    kernel = functools.partial(_forward_kernel, block, radius, w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wg, c), features_nhwc.dtype),
        grid=(n, h // block),
        in_specs=[
            pl.BlockSpec((1, block, wg), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block, wg), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block, wg), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block, wg), lambda i, j: (i, j, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded features (HBM)
        ],
        out_specs=pl.BlockSpec((1, block, wg, c), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(((block + window - 1) * w, c), features_nhwc.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x0, tx, y0, ty, padded)
    return out[..., :c_in]


def _run_grad(g_nhwc, x0, tx, y0, ty, radius, h, w, c_in, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = g_nhwc.shape[0]
    wg = x0.shape[-1]
    window = 2 * radius + 2
    block = _BLOCK_ROWS
    c = c_in + ((-c_in) % 128)

    # Pad cotangents/params so source row y sees output rows
    # [y - radius - 1, y + radius]; sentinel params never match any row.
    pad_rows = ((0, 0), (radius + 1, radius), (0, 0))
    hp = h + window - 1
    g_pad = jnp.pad(g_nhwc, pad_rows + ((0, c - c_in),)).reshape(n, hp * wg, c)
    x0_pad = jnp.pad(x0, pad_rows, constant_values=-10)
    tx_pad = jnp.pad(tx, pad_rows)
    y0_pad = jnp.pad(y0, pad_rows, constant_values=-(10 + h))
    ty_pad = jnp.pad(ty, pad_rows)

    kernel = functools.partial(_grad_kernel, block, radius, wg)
    df = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dtype),
        grid=(n, h // block),
        in_specs=[
            pl.BlockSpec((1, hp, wg), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, hp, wg), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, hp, wg), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, hp, wg), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded cotangents (HBM)
        ],
        out_specs=pl.BlockSpec((1, block, w, c), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(((block + window - 1) * wg, c), dtype),
            pltpu.VMEM((window * wg, w), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x0_pad, tx_pad, y0_pad, ty_pad, g_pad)
    return df[..., :c_in]


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_features(
    input: Float[Array, "n c h w"],
    grid: Float[Array, "n h wg 2"],
    radius: int = 16,
) -> Float[Array, "n c h wg"]:
    """Bilinear displacement warp; NO gradient to `grid` (frozen-flow use)."""
    return _warp_forward(input, grid, radius)


def _warp_forward(input, grid, radius):
    if not _on_tpu():
        return warp_bilinear_matmul(input, grid, radius=radius)
    n, c, h, w = input.shape
    x0, tx, y0, ty = _sample_params(grid, h, w, radius)
    out = _run_forward(input.transpose(0, 2, 3, 1), x0, tx, y0, ty, radius)
    return out.transpose(0, 3, 1, 2)


def _warp_fwd(input, grid, radius):
    return _warp_forward(input, grid, radius), (input, grid)


def _warp_bwd(radius, residuals, g):
    input, grid = residuals
    if not _on_tpu():
        _, vjp = jax.vjp(
            lambda f: warp_bilinear_matmul(f, grid, radius=radius), input
        )
        (df,) = vjp(g)
        return df, jnp.zeros_like(grid)
    n, c, h, w = input.shape
    x0, tx, y0, ty = _sample_params(grid, h, w, radius)
    df = _run_grad(
        g.transpose(0, 2, 3, 1), x0, tx, y0, ty, radius, h, w, c, input.dtype
    )
    return df.transpose(0, 3, 1, 2), jnp.zeros_like(grid)


warp_features.defvjp(_warp_fwd, _warp_bwd)
