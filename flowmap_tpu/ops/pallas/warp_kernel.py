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
from . import runtime as _rt
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


def _hit(delta_int):
    """Arithmetic one-hot — max(0, 1 - |delta|), exact for integer deltas in
    f32. Wide boolean masks trip a Mosaic relayout bug, so no `==` anywhere."""
    delta = delta_int.astype(jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(delta), 0.0)


def _forward_kernel(
    block,
    radius,
    c,
    x0_ref,
    tx_ref,
    y0_ref,
    ty_ref,
    f_hbm,
    out_ref,
    f_vmem,
    o_vmem,
    sem,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window = 2 * radius + 2
    wg = x0_ref.shape[-1]
    w = f_vmem.shape[1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    base = j * block
    ext = block + window - 1

    # The bilinear weight matrix is separable: W[j, (d, x)] = wy[j, d] *
    # wx[j, x]. Exploit it by (1) one MXU call per output row against a
    # COLUMN-MAJOR feature window F2[x, (slot, ch)] — giving every window
    # slot's column-interpolated row at once — then (2) a cheap
    # `sum_d wy[:, d] * out2[:, d*c:(d+1)*c]` accumulation. This avoids
    # materializing the (wg, window*w) one-hot, which is ~20x the VPU work.
    #
    # Features arrive column-flattened ((n, w, hp*c)); the slot window
    # [base, base + ext) (a lane slice, c-aligned) is DMA'd into a
    # DOUBLE-BUFFERED VMEM scratch: each program kicks off the next
    # program's copy before computing, so the DMA rides under the MXU work
    # instead of serializing in front of it.
    def start_copy(slot, ii, bb):
        pltpu.make_async_copy(
            f_hbm.at[ii, :, pl.ds(bb * c, ext * c)],
            f_vmem.at[slot],
            sem.at[slot],
        ).start()

    step = i * nj + j
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_copy(0, i, base)

    @pl.when(step + 1 < pl.num_programs(0) * nj)
    def _():
        nxt_i = jax.lax.select(j + 1 < nj, i, i + 1)
        nxt_b = jax.lax.select(j + 1 < nj, (j + 1) * block, 0)
        start_copy(jax.lax.rem(step + 1, 2), nxt_i, nxt_b)

    pltpu.make_async_copy(
        f_hbm.at[i, :, pl.ds(base * c, ext * c)],
        f_vmem.at[slot],
        sem.at[slot],
    ).wait()

    cols = jax.lax.broadcasted_iota(jnp.int32, (wg, w), 1)

    for r in range(block):
        x0 = x0_ref[0, r, :][:, None]
        tx = tx_ref[0, r, :][:, None]
        y0 = y0_ref[0, r, :][:, None]
        ty = ty_ref[0, r, :][:, None]

        # Horizontal one-hot pair; out-of-image x matches no column (zeros
        # padding is automatic).
        wx = (
            _hit(cols - x0) * (1.0 - tx) + _hit(cols - (x0 + 1)) * tx
        ).astype(f_hbm.dtype)

        o_vmem[...] = jnp.dot(
            wx,
            f_vmem[slot, :, pl.ds(r * c, window * c)],
            preferred_element_type=jnp.float32,
        )

        # Window slot d holds source row (base + r) + d - radius; y0's slot
        # (out-of-window slots match no d — the vertical zeros padding).
        slot0 = y0 - (base + r) + radius

        def accd(d, acc):
            wy = _hit(slot0 - d) * (1.0 - ty) + _hit(slot0 + 1 - d) * ty
            return acc + wy * o_vmem[:, pl.ds(d * c, c)]

        acc = jax.lax.fori_loop(
            0, window, accd, jnp.zeros((wg, c), jnp.float32)
        )
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
    wx_vmem,
    wy_vmem,
    sem,
):
    """Feature cotangent; see module docstring."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window = 2 * radius + 2
    w = df_ref.shape[-2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    base = j * block
    ext_rows = (block + window - 1) * wg

    # Cotangents arrive row-flattened ((n, hp*wg, c)); the window is DMA'd
    # into a double-buffered scratch (next program's copy started before this
    # program's compute — see forward kernel).
    def start_copy(slot, ii, bb):
        pltpu.make_async_copy(
            g_hbm.at[ii, pl.ds(bb * wg, ext_rows)],
            g_vmem.at[slot],
            sem.at[slot],
        ).start()

    step = i * nj + j
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_copy(0, i, base)

    @pl.when(step + 1 < pl.num_programs(0) * nj)
    def _():
        nxt_i = jax.lax.select(j + 1 < nj, i, i + 1)
        nxt_b = jax.lax.select(j + 1 < nj, (j + 1) * block, 0)
        start_copy(jax.lax.rem(step + 1, 2), nxt_i, nxt_b)

    pltpu.make_async_copy(
        g_hbm.at[i, pl.ds(base * wg, ext_rows)],
        g_vmem.at[slot],
        sem.at[slot],
    ).wait()

    # Transposed flattened form with the separable weights split the other
    # way: df[y] = Wx_flat(window*wg, w)^T-contracted-with (wy * g)_flat.
    # The column one-hots Wx depend only on the OUTPUT row, so they are
    # built ONCE per program for all block + window - 1 padded rows (each
    # source row reuses an overlapping slice); the row weights wy are folded
    # into the cotangent (a (N, 1)-column broadcast), never materializing
    # the full weight matrix.
    cols = jax.lax.broadcasted_iota(jnp.int32, (wg, w), 1)
    ext = block + window - 1

    def build_wx(q, carry):
        x0 = x0_ref[0, base + q, :][:, None]
        tx = tx_ref[0, base + q, :][:, None]
        wx_vmem[pl.ds(q * wg, wg)] = (
            _hit(cols - x0) * (1.0 - tx) + _hit(cols - (x0 + 1)) * tx
        ).astype(wx_vmem.dtype)
        return carry

    jax.lax.fori_loop(0, ext, build_wx, 0)

    for r in range(block):
        y = base + r  # source row

        def build_wy(d, carry):
            # Contributing output row i_abs = y - radius - 1 + d; with the
            # (radius + 1)-row top padding, padded param row = base + r + d.
            y0 = y0_ref[0, base + r + d, :][:, None]
            ty = ty_ref[0, base + r + d, :][:, None]
            wy_vmem[pl.ds(d * wg, wg)] = _hit(y0 - y) * (1.0 - ty) + _hit(
                y0 - (y - 1)
            ) * ty
            return carry

        jax.lax.fori_loop(0, window, build_wy, 0)

        gw = (wy_vmem[...] * g_vmem[slot, r * wg : (r + window) * wg]).astype(
            g_hbm.dtype
        )
        acc = jax.lax.dot_general(
            wx_vmem[r * wg : (r + window) * wg],
            gw,
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
    # Column-major window layout: F2[n, x, slot_row * c + ch].
    padded = (
        jnp.pad(
            features_nhwc,
            ((0, 0), (radius, radius + 1), (0, 0), (0, c - c_in)),
        )
        .transpose(0, 2, 1, 3)
        .reshape(n, w, hp * c)
    )

    kernel = functools.partial(_forward_kernel, block, radius, c)
    out = _rt.pallas_call(
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
            pltpu.VMEM(
                (2, w, (block + window - 1) * c), features_nhwc.dtype
            ),
            pltpu.VMEM((wg, window * c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    df = _rt.pallas_call(
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
            pltpu.VMEM((2, (block + window - 1) * wg, c), dtype),
            pltpu.VMEM(((block + window - 1) * wg, w), dtype),
            pltpu.VMEM((window * wg, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x0_pad, tx_pad, y0_pad, ty_pad, g_pad)
    return df[..., :c_in]


def _on_tpu() -> bool:
    return _rt.kernels_enabled()


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
