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
    block, radius, x0_ref, tx_ref, y0_ref, ty_ref, f_hbm, out_ref, f_vmem, sem
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window = 2 * radius + 2
    wg = x0_ref.shape[-1]
    w = f_vmem.shape[-2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = j * block

    # DMA the row window [base, base + block + window - 1) of the padded
    # features for this pair into VMEM.
    copy = pltpu.make_async_copy(
        f_hbm.at[i, pl.ds(base, block + window - 1)], f_vmem, sem
    )
    copy.start()
    copy.wait()

    cols = jax.lax.broadcasted_iota(jnp.int32, (wg, w), 1)

    for r in range(block):
        x0 = x0_ref[0, r, :]
        tx = tx_ref[0, r, :]
        y0 = y0_ref[0, r, :]
        ty = ty_ref[0, r, :]

        x0b = x0[:, None]
        wx = (
            jnp.where(cols == x0b, (1.0 - tx)[:, None], 0.0)
            + jnp.where(cols == x0b + 1, tx[:, None], 0.0)
        ).astype(f_vmem.dtype)

        # Window slot d holds source row (base + r) + d - radius, which is
        # f_vmem row r + d; y0's slot:
        slot0 = y0 - (base + r) + radius  # (wg,) int

        acc = jnp.zeros((wg, f_vmem.shape[-1]), jnp.float32)
        for d in range(window):
            w0 = jnp.where(slot0 == d, 1.0 - ty, 0.0)
            w1 = jnp.where(slot0 + 1 == d, ty, 0.0)
            weight = (w0 + w1).astype(jnp.float32)
            row = f_vmem[r + d]  # (w, c)
            contrib = jnp.dot(wx, row, preferred_element_type=jnp.float32)
            acc = acc + weight[:, None] * contrib
        out_ref[0, r] = acc.astype(out_ref.dtype)


def _grad_kernel(
    block, radius, x0_ref, tx_ref, y0_ref, ty_ref, g_hbm, df_ref, g_vmem, sem
):
    """Feature cotangent; see module docstring."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window = 2 * radius + 2
    wg = x0_ref.shape[-1]
    w = df_ref.shape[-2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = j * block

    copy = pltpu.make_async_copy(
        g_hbm.at[i, pl.ds(base, block + window - 1)], g_vmem, sem
    )
    copy.start()
    copy.wait()

    cols = jax.lax.broadcasted_iota(jnp.int32, (wg, w), 1)

    for r in range(block):
        y = base + r  # source row
        acc = jnp.zeros((w, df_ref.shape[-1]), jnp.float32)
        for d in range(window):
            # Contributing output rows i_abs = y - radius - 1 + d; with the
            # (radius + 1)-row top padding, padded row = base + r + d, which
            # is g_vmem row r + d.
            x0 = x0_ref[0, base + r + d]
            tx = tx_ref[0, base + r + d]
            y0 = y0_ref[0, base + r + d]
            ty = ty_ref[0, base + r + d]
            w0 = jnp.where(y0 == y, 1.0 - ty, 0.0)
            w1 = jnp.where(y0 == y - 1, ty, 0.0)
            weight = (w0 + w1).astype(jnp.float32)

            x0b = x0[:, None]
            wx = (
                jnp.where(cols == x0b, (1.0 - tx)[:, None], 0.0)
                + jnp.where(cols == x0b + 1, tx[:, None], 0.0)
            ).astype(g_vmem.dtype)

            g_row = g_vmem[r + d]  # (wg, c)
            weighted = (weight[:, None] * g_row.astype(jnp.float32)).astype(
                g_vmem.dtype
            )
            acc = acc + jnp.dot(wx.T, weighted, preferred_element_type=jnp.float32)
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
    padded = jnp.pad(
        features_nhwc,
        ((0, 0), (radius, radius + 1), (0, 0), (0, c - c_in)),
    )

    kernel = functools.partial(_forward_kernel, block, radius)
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
            pltpu.VMEM((block + window - 1, w, c), features_nhwc.dtype),
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
    g_pad = jnp.pad(g_nhwc, pad_rows + ((0, c - c_in),))
    x0_pad = jnp.pad(x0, pad_rows, constant_values=-10)
    tx_pad = jnp.pad(tx, pad_rows)
    y0_pad = jnp.pad(y0, pad_rows, constant_values=-(10 + h))
    ty_pad = jnp.pad(ty, pad_rows)
    hp = h + window - 1

    kernel = functools.partial(_grad_kernel, block, radius)
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
            pltpu.VMEM((block + window - 1, wg, c), dtype),
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
