"""Pallas TPU kernel: small-radius bilinear warp as a VPU shift stencil.

The native-resolution correspondence-weight path warps (n, h, w, c) feature
maps by per-pixel displacements bounded by a few pixels (the radii are sized
from the actual flow). Each output pixel's 4 bilinear taps live inside a
(2*ry + 2) x (2*rx + 2) window of statically shifted slices weighted by
arithmetic one-hots. The pure-XLA stencil (`ops/warp.py:warp_bilinear_shifts`)
is semantically identical, but XLA assigns it batch-minor layouts inherited
from the surrounding convolutions and the fusions run at ~25 GB/s
(layout-bound, ~44 ms/step at reference scale). This kernel pins the VMEM
layout to (rows, w, c) and runs the tap loop on the VPU: HBM traffic is
features in + output out.

Forward: one program per (frame pair, block of output rows); the padded
feature rows the block can touch are DMA'd into a double-buffered VMEM
scratch; interpolation parameters (tx, ty and integer corner offsets) arrive
per output-row block via BlockSpecs.

Backward (custom_vjp; the sampling grid is frozen optical flow — its
cotangent is zero): the transposed stencil has the same window structure
with negated offsets,

    d_in[u, v] = sum_{sy, sx} (wy_sy * wx_sx * g)[u - sy, v - sx],

so the SAME stencil runs on the zero-padded cotangent with the parameter
planes padded alongside and sliced at each tap's offset (zero-padded g
nullifies out-of-range terms). The four padded planes are lane-concatenated
into one (n, hp, 4*wp) array and DMA'd per row-window exactly like the
features: every in-kernel slice then has a *static* (sub)lane offset, which
Mosaic lowers at any radius (BlockSpec'd whole planes sliced at dynamic row
offsets fail to prove 8-row alignment once the padded width spans multiple
lane tiles).

Both directions are exercised against the XLA stencil (itself verified
against torch-semantics grid_sample) in interpret mode on CPU
(tests/test_shift_warp_kernel.py).
"""

from __future__ import annotations

import functools

import jax
from . import runtime as _rt
import jax.numpy as jnp
from jaxtyping import Array, Float


def _hit(d):
    """max(0, 1 - |d|): exact one-hot for integer-valued f32 deltas."""
    return jnp.maximum(1.0 - jnp.abs(d), 0.0)


def _feature_dma(block, window_rows, f_hbm, f_vmem, sem):
    """Double-buffered row-window DMA schedule shared by both directions.

    Returns the slot holding this program's window (after waiting on it) and
    kicks off the next program's copy. `sem` is indexed [slot, stream] so a
    second stream (the backward's parameter planes) can ride the same
    schedule.
    """
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    step = i * nj + j
    slot = jax.lax.rem(step, 2)
    nxt_i = jax.lax.select(j + 1 < nj, i, i + 1)
    nxt_j = jax.lax.select(j + 1 < nj, j + 1, 0)
    return slot, step, nxt_i, nxt_j


def _stencil_fwd_kernel(
    block,
    ry,
    rx,
    w,
    tx_ref,
    ty_ref,
    oxf_ref,
    oyf_ref,
    f_hbm,
    out_ref,
    f_vmem,
    sem,
):
    """Accumulate the (2ry+2) x (2rx+2) tap window for one output row block.

    Parameters are indexed at the OUTPUT pixel (one block row of the
    unpadded planes, via BlockSpec).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window_rows = block + 2 * ry + 1
    slot, step, nxt_i, nxt_j = _feature_dma(block, window_rows, f_hbm, f_vmem, sem)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    def start_copy(s, ii, jj):
        pltpu.make_async_copy(
            f_hbm.at[ii, pl.ds(jj * block, window_rows)],
            f_vmem.at[s],
            sem.at[s],
        ).start()

    @pl.when(step == 0)
    def _():
        start_copy(0, i, j)

    @pl.when(step + 1 < pl.num_programs(0) * nj)
    def _():
        start_copy(jax.lax.rem(step + 1, 2), nxt_i, nxt_j)

    pltpu.make_async_copy(
        f_hbm.at[i, pl.ds(j * block, window_rows)],
        f_vmem.at[slot],
        sem.at[slot],
    ).wait()

    c = out_ref.shape[-2]
    acc = jnp.zeros((block, c, w), jnp.float32)
    for sy in range(-ry, ry + 2):
        dy = sy + ry
        ty_s = ty_ref[0]
        oy_s = oyf_ref[0]
        wy_full = (1.0 - ty_s) * _hit(oy_s - sy) + ty_s * _hit(oy_s - sy + 1.0)
        for sx in range(-rx, rx + 2):
            dx = sx + rx
            tx_s = tx_ref[0]
            ox_s = oxf_ref[0]
            wx = (1.0 - tx_s) * _hit(ox_s - sx) + tx_s * _hit(ox_s - sx + 1.0)
            # (block, w) -> (block, 1, w): a mid-dim unit insertion is a
            # layout no-op (lanes stay w); the multiply then broadcasts
            # along sublanes (channels) natively.
            wt = (wy_full * wx).reshape(block, 1, w)
            tap = f_vmem[slot, pl.ds(dy, block), :, pl.ds(dx, w)]
            acc = acc + wt * tap.astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _stencil_bwd_kernel(
    block,
    ry,
    rx,
    w,
    wp,
    p_hbm,
    f_hbm,
    out_ref,
    f_vmem,
    p_vmem,
    sem,
):
    """Transposed stencil: parameters are whole PADDED planes, row-windowed
    by DMA alongside the cotangent, and sliced at each tap's offset.

    Plane k of [tx, ty, oxf, oyf] lives at lanes [k*wp, (k+1)*wp) of p_hbm,
    so every slice below has a static offset. p_hbm carries a unit dim ahead
    of the lanes so its row dim is untiled (Mosaic only allows unaligned
    window slices on untiled dims — same reason f_hbm is 4-D).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    window_rows = block + 2 * ry + 1
    slot, step, nxt_i, nxt_j = _feature_dma(block, window_rows, f_hbm, f_vmem, sem)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    def start_copy(s, ii, jj):
        pltpu.make_async_copy(
            f_hbm.at[ii, pl.ds(jj * block, window_rows)],
            f_vmem.at[s],
            sem.at[s, 0],
        ).start()
        pltpu.make_async_copy(
            p_hbm.at[ii, pl.ds(jj * block, window_rows)],
            p_vmem.at[s],
            sem.at[s, 1],
        ).start()

    @pl.when(step == 0)
    def _():
        start_copy(0, i, j)

    @pl.when(step + 1 < pl.num_programs(0) * nj)
    def _():
        start_copy(jax.lax.rem(step + 1, 2), nxt_i, nxt_j)

    pltpu.make_async_copy(
        f_hbm.at[i, pl.ds(j * block, window_rows)],
        f_vmem.at[slot],
        sem.at[slot, 0],
    ).wait()
    pltpu.make_async_copy(
        p_hbm.at[i, pl.ds(j * block, window_rows)],
        p_vmem.at[slot],
        sem.at[slot, 1],
    ).wait()

    c = out_ref.shape[-2]
    acc = jnp.zeros((block, c, w), jnp.float32)
    for sy in range(-ry, ry + 2):
        dy = ry + 1 - sy
        rows = pl.ds(dy, block)
        ty_s = p_vmem[slot, rows, 0, pl.ds(wp, wp)]
        oy_s = p_vmem[slot, rows, 0, pl.ds(3 * wp, wp)]
        wy_full = (1.0 - ty_s) * _hit(oy_s - sy) + ty_s * _hit(oy_s - sy + 1.0)
        for sx in range(-rx, rx + 2):
            dx = rx + 1 - sx
            tx_s = p_vmem[slot, rows, 0, pl.ds(dx, w)]
            ox_s = p_vmem[slot, rows, 0, pl.ds(2 * wp + dx, w)]
            wyx = wy_full[:, dx : dx + w]
            wx = (1.0 - tx_s) * _hit(ox_s - sx) + tx_s * _hit(ox_s - sx + 1.0)
            wt = (wyx * wx).reshape(block, 1, w)
            tap = f_vmem[slot, pl.ds(dy, block), :, pl.ds(dx, w)]
            acc = acc + wt * tap.astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_block(h: int) -> int:
    for b in (8, 10, 5, 4, 2):
        if h % b == 0:
            return b
    return 1


def _run_stencil_fwd(fpad, tx, ty, oxf, oyf, ry, rx, h, w, c, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = fpad.shape[0]
    block = _pick_block(h)
    window_rows = block + 2 * ry + 1
    wp = fpad.shape[-1]
    plane_spec = pl.BlockSpec((1, block, w), lambda i, j: (i, j, 0))

    kernel = functools.partial(_stencil_fwd_kernel, block, ry, rx, w)
    return _rt.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), dtype),
        grid=(n, h // block),
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, block, c, w), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, c, wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(tx, ty, oxf, oyf, fpad)


def _run_stencil_bwd(gpad, planes, ry, rx, h, w, c, wp, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = gpad.shape[0]
    block = _pick_block(h)
    window_rows = block + 2 * ry + 1
    gw = gpad.shape[-1]

    kernel = functools.partial(_stencil_bwd_kernel, block, ry, rx, w, wp)
    return _rt.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), dtype),
        grid=(n, h // block),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, block, c, w), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, c, gw), dtype),
            pltpu.VMEM((2, window_rows, 1, 4 * wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(planes, gpad)


def _sample_params(grid, h, w):
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    oxf = x0 - jnp.arange(w, dtype=x0.dtype)[None, None, :]
    oyf = y0 - jnp.arange(h, dtype=y0.dtype)[None, :, None]
    n = grid.shape[0]
    return (
        tx,
        ty,
        jnp.broadcast_to(oxf, (n, h, w)),
        jnp.broadcast_to(oyf, (n, h, w)),
    )


def _on_tpu() -> bool:
    return _rt.kernels_enabled()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_shifts_tpu(
    input_nhwc: Float[Array, "n h w c"],
    grid: Float[Array, "n h w 2"],
    radius_y: int,
    radius_x: int,
) -> Float[Array, "n h w c"]:
    """Shift-stencil bilinear warp; NO gradient to `grid` (frozen-flow use).

    On TPU this is the Pallas kernel; elsewhere it falls back to the XLA
    stencil (numerically identical; `ops/warp.py:warp_bilinear_shifts`
    internals are the shared reference semantics — torch grid_sample with
    zeros padding, align_corners=False).
    """
    return _forward(input_nhwc, grid, radius_y, radius_x)


def _forward(input_nhwc, grid, ry, rx):
    if not _on_tpu():
        from ..warp import _shifts_forward

        return _shifts_forward(input_nhwc, grid, ry, rx)
    n, h, w, c = input_nhwc.shape
    tx, ty, oxf, oyf = _sample_params(grid, h, w)
    # Kernel layout is (rows, channels, width): lanes = width. The manual
    # DMA needs the lane dim 128-aligned and the sublane dim 8-aligned.
    fhcw = jnp.transpose(input_nhwc, (0, 1, 3, 2))
    wp = w + 2 * rx + 1
    extra = (-wp) % 128
    fpad = jnp.pad(
        fhcw,
        ((0, 0), (ry, ry + 1), (0, (-c) % 8), (rx, rx + 1 + extra)),
    )
    out = _run_stencil_fwd(
        fpad, tx, ty, oxf, oyf, ry, rx, h, w, fpad.shape[2],
        input_nhwc.dtype,
    )
    return jnp.transpose(out[:, :, :c], (0, 1, 3, 2))


def _fwd(input_nhwc, grid, ry, rx):
    token = jnp.zeros((0,), input_nhwc.dtype)
    return _forward(input_nhwc, grid, ry, rx), (grid, token)


def _bwd(ry, rx, residuals, g):
    grid, token = residuals
    dtype = token.dtype
    n, h, w, _ = grid.shape
    if not _on_tpu():
        from ..warp import _shifts_bwd

        return _shifts_bwd(ry, rx, (grid, token), g)
    c = g.shape[-1]
    tx, ty, oxf, oyf = _sample_params(grid, h, w)
    # Padded plane width: one full 128-lane-aligned tile span per plane so
    # the lane-concat below keeps each plane's base offset 128-aligned.
    wp = w + 2 * rx + 1
    wp += (-wp) % 128
    pad2 = ((0, 0), (ry + 1, ry), (rx + 1, wp - w - 2 * rx - 1 + rx))
    ghcw = jnp.transpose(g.astype(dtype), (0, 1, 3, 2))
    gp = jnp.pad(
        ghcw,
        ((0, 0), (ry + 1, ry), (0, (-c) % 8), (rx + 1, wp - w - rx - 1)),
    )
    planes = jnp.concatenate(
        [jnp.pad(p, pad2) for p in (tx, ty, oxf, oyf)], axis=-1
    )[:, :, None, :]
    d_in = _run_stencil_bwd(
        gp, planes, ry, rx, h, w, gp.shape[2], wp, dtype
    )
    return jnp.transpose(d_in[:, :, :c], (0, 1, 3, 2)), jnp.zeros_like(grid)


warp_shifts_tpu.defvjp(_fwd, _bwd)
