"""Fused MBConv Pallas kernels for the EfficientNet-Lite3 encoder.

A profile of the reference-scale train step (150 frames, 160x224) shows the
MiDaS encoder dominated not by FLOPs but by HBM round-trips and per-op
overhead: the /16 and /32 stages alone execute ~960 XLA ops of ~20 us each
(~21 ms/step), and every MBConv materializes its 6x-expanded hidden tensor
to HBM twice. Here each stride-1 MBConv block (expand 1x1 -> relu6 ->
depthwise kxk -> relu6 -> project 1x1 -> residual) runs as ONE kernel per
direction: the expanded hidden tensor lives only in VMEM, three
convolutions plus activations plus the residual collapse into a single
pallas_call, and the backward recomputes the forward per frame-block in
VMEM (rematerialization is free here — recompute beats re-reading HBM) and
accumulates all six weight gradients in f32 output refs across the
(sequential) TPU grid.

`mbconv_chain` runs a run of consecutive blocks with ONE pad/slice at the
chain boundary: frames pad to a multiple of 8 (frame blocks are 1/2/4/8),
W pads to the sublane tile, channels pad to the 128 lane tile. Zero-padded
W columns are re-masked after each bias+relu6 (relu6(bias) != 0), so
depthwise taps near the right edge see exact SAME-padding zeros.

Reference semantics: `flowmap/model/backbone/backbone_midas.py` loads
torch-hub MiDaS_small whose encoder is EfficientNet-Lite3; each block
matches `midas_net._mbconv` with folded BatchNorm (the pretrained path).
Batch-statistics BN couples frames and cannot run in a per-frame kernel;
the from-scratch path keeps the XLA formulation.

Layout: activations are (bf, H, Wp, Cp) with channels on lanes and W on
sublanes. Depthwise taps are static slices: dy indexes H (an untiled dim),
dx indexes W (static sublane offsets). The 1x1 convs collapse (bf, H, Wp)
into one pixel axis — layout-preserving because Wp is sublane-aligned — and
run on the MXU with f32 accumulation (exact, unlike the XLA path's
default-precision convs, which round inputs to bf16 even for f32 tensors).

Both directions are verified against the XLA reference chain (value + grad,
at HIGHEST matmul precision where the comparison is exact to f32) in
interpret mode on CPU and on TPU (tests/test_mbconv_kernel.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import runtime as _rt

# Total per-core VMEM budget the planner packs into (the hardware limit is
# ~16 MB; leave headroom for Mosaic stack and double-buffered DMA).
_VMEM_BUDGET = 12 * 10**6


@dataclass(frozen=True)
class MBConvSpec:
    """Static shape/config of one stride-1 expanded MBConv block."""

    cin: int
    cmid: int
    cout: int
    kernel: int
    residual: bool


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _lanes(c: int) -> int:
    return _ceil_to(c, 128)


def _clip_vjp_mask(z):
    """d clip(z, 0, 6)/dz with JAX's tie convention (0.5 at exact 0/6)."""
    inner = ((z > 0.0) & (z < 6.0)).astype(jnp.float32)
    ties = ((z == 0.0) | (z == 6.0)).astype(jnp.float32)
    return inner + 0.5 * ties


def _relu6_f32(z):
    return jnp.clip(z, 0.0, 6.0)


def _prec(a):
    # Pin f32 dots to HIGHEST so the kernel is exact regardless of the
    # ambient default_matmul_precision (which does not reach the
    # separately-traced backward kernel). bf16 operands are single-pass MXU
    # either way — and Mosaic rejects HIGHEST for them ("Bad lhs type").
    return jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(a),
    )


def _dot_t(a, b, contract):
    ca, cb = contract
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(a),
    )


def _w_mask(h: int, wp: int, w_real: int, dtype):
    """(1, h, wp, 1) mask: 1 on real columns, 0 on the W padding."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, h, wp, 1), 2)
    return (col < w_real).astype(dtype)


def _block_fwd_vmem(x, wts, spec: MBConvSpec, w_real: int, want_pre=False):
    """One MBConv block on VMEM values.

    x: (bf, H, Wp, cinp) compute-dtype. Returns y (bf, H, Wp, coutp) — or,
    when `want_pre`, just the f32 pre-activations (z1, mid1, z2, mid2) the
    backward needs (the project output is never used there).
    """
    we, be, wdw, bdw, wpr, bp = wts
    bf, h, wp, cinp = x.shape
    cdt = x.dtype
    k = spec.kernel
    p = (k - 1) // 2
    cmidp = we.shape[1]

    mask = None if w_real == wp else _w_mask(h, wp, w_real, jnp.float32)

    def clipmask(z):
        r = _relu6_f32(z)
        return (r if mask is None else r * mask).astype(cdt)

    z1 = _dot(x.reshape(bf * h * wp, cinp), we).reshape(bf, h, wp, cmidp)
    z1 = z1 + be.astype(jnp.float32)
    mid1 = clipmask(z1)

    pad = jnp.pad(mid1, ((0, 0), (p, p), (p, p), (0, 0)))
    acc = jnp.zeros((bf, h, wp, cmidp), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = wdw[dy * k + dx].astype(jnp.float32)  # (cmidp,)
            sl = pad[:, dy : dy + h, dx : dx + wp, :]
            acc = acc + sl.astype(jnp.float32) * tap[None, None]
    z2 = acc + bdw.astype(jnp.float32)
    mid2 = clipmask(z2)
    if want_pre:
        return z1, mid1, z2, mid2

    y = _dot(mid2.reshape(bf * h * wp, cmidp), wpr)
    coutp = wpr.shape[1]
    y = (y + bp.astype(jnp.float32)).astype(cdt).reshape(bf, h, wp, coutp)
    if spec.residual:
        y = y + x
    return y


def _fwd_kernel(spec, w_real, x_ref, *refs):
    wts = tuple(r[...] for r in refs[:6])
    out_ref = refs[6]
    out_ref[...] = _block_fwd_vmem(x_ref[...], wts, spec, w_real)


def _bwd_kernel(spec, w_real, x_ref, *refs):
    wts = tuple(r[...] for r in refs[:6])
    g_ref = refs[6]
    dx_ref = refs[7]
    gw_refs = refs[8:]
    we, be, wdw, bdw, wpr, bp = wts
    cdt = x_ref.dtype
    k = spec.kernel
    p = (k - 1) // 2
    cinp = we.shape[0]
    cmidp = we.shape[1]

    xin = x_ref[...]
    bf, h, wp, _ = xin.shape
    maskf = None if w_real == wp else _w_mask(h, wp, w_real, jnp.float32)
    z1, mid1, z2, mid2 = _block_fwd_vmem(xin, wts, spec, w_real, True)

    def wmask(t):
        return t if maskf is None else t * maskf

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in gw_refs:
            r[...] = jnp.zeros_like(r)

    g = g_ref[...].astype(jnp.float32)
    gc = g.astype(cdt)
    # Project: y = mid2 @ wpr + bp (+ xin).
    gw_refs[4][...] += _dot_t(
        mid2.reshape(-1, cmidp), gc.reshape(-1, wpr.shape[1]), (0, 0)
    )
    gw_refs[5][...] += jnp.sum(g, axis=(0, 1, 2))[None]
    d_mid2 = _dot_t(gc.reshape(-1, wpr.shape[1]), wpr, (1, 1)).reshape(
        bf, h, wp, cmidp
    )
    d_z2 = wmask(d_mid2 * _clip_vjp_mask(z2))

    # Depthwise: z2 = sum_taps shift(mid1) * wdw + bdw. Per tap, reduce only
    # over the untiled (bf, h) dims; the single cross-sublane reduction over
    # wp happens once on the stacked (k*k, wp, cmidp) partials.
    gw_refs[3][...] += jnp.sum(d_z2, axis=(0, 1, 2))[None]
    pad_m = jnp.pad(mid1, ((0, 0), (p, p), (p, p), (0, 0)))
    dww_rows = []
    for dy in range(k):
        for dx in range(k):
            sl = pad_m[:, dy : dy + h, dx : dx + wp, :]
            dww_rows.append(jnp.sum(sl.astype(jnp.float32) * d_z2, axis=(0, 1)))
    gw_refs[2][...] += jnp.sum(jnp.stack(dww_rows), axis=1)
    # Transposed depthwise: flipped-kernel stencil on the padded cotangent.
    d_z2c = d_z2.astype(cdt)
    pad_g = jnp.pad(d_z2c, ((0, 0), (p, p), (p, p), (0, 0)))
    d_mid1 = jnp.zeros((bf, h, wp, cmidp), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = wdw[dy * k + dx].astype(jnp.float32)
            sl = pad_g[
                :, k - 1 - dy : k - 1 - dy + h, k - 1 - dx : k - 1 - dx + wp, :
            ]
            d_mid1 = d_mid1 + sl.astype(jnp.float32) * tap[None, None]
    d_z1 = wmask(d_mid1 * _clip_vjp_mask(z1))

    # Expand: z1 = xin @ we + be.
    gw_refs[1][...] += jnp.sum(d_z1, axis=(0, 1, 2))[None]
    d_z1c = d_z1.astype(cdt)
    gw_refs[0][...] += _dot_t(
        xin.reshape(-1, cinp), d_z1c.reshape(-1, cmidp), (0, 0)
    )
    d_x = _dot_t(d_z1c.reshape(-1, cmidp), we, (1, 1)).reshape(bf, h, wp, cinp)
    dx_ref[...] = (d_x + g if spec.residual else d_x).astype(dx_ref.dtype)


def _pad_block_weights(spec: MBConvSpec, p, cdt):
    """Pad one block's weights to lane multiples (operand list of 6).

    Zero padding keeps padded lanes exactly zero through bias+relu6.
    """
    cinp, cmidp, coutp = _lanes(spec.cin), _lanes(spec.cmid), _lanes(spec.cout)
    k = spec.kernel

    def padc(a, rows, cols):
        return jnp.pad(
            a, ((0, rows - a.shape[0]), (0, cols - a.shape[1]))
        ).astype(cdt)

    return [
        padc(p["expand_conv"]["kernel"].reshape(spec.cin, spec.cmid), cinp, cmidp),
        padc(p["expand_conv"]["bias"].reshape(1, spec.cmid), 1, cmidp),
        padc(p["dw_conv"]["kernel"].reshape(k * k, spec.cmid), k * k, cmidp),
        padc(p["dw_conv"]["bias"].reshape(1, spec.cmid), 1, cmidp),
        padc(p["project_conv"]["kernel"].reshape(spec.cmid, spec.cout), cmidp, coutp),
        padc(p["project_conv"]["bias"].reshape(1, spec.cout), 1, coutp),
    ]


def _weight_bytes(spec: MBConvSpec, itemsize: int) -> int:
    cinp, cmidp, coutp = _lanes(spec.cin), _lanes(spec.cmid), _lanes(spec.cout)
    return (
        cinp * cmidp
        + (spec.kernel * spec.kernel + 2) * cmidp
        + cmidp * coutp
        + coutp
    ) * itemsize


def _frames_per_block(spec: MBConvSpec, h, wp, itemsize, backward) -> int:
    """Largest frame block in {1, 2, 4, 8} fitting the VMEM budget."""
    cinp, cmidp, coutp = _lanes(spec.cin), _lanes(spec.cmid), _lanes(spec.cout)
    fixed = _weight_bytes(spec, itemsize)
    if backward:
        fixed += 2 * _weight_bytes(spec, 4)  # f32 accumulators + init
        per_frame = h * wp * (
            2 * cinp * itemsize  # xin + dx
            + cmidp * (3 * 4 + 2 * itemsize)  # z1/z2/acc f32, mid1/mid2
            + coutp * itemsize  # g
        )
    else:
        per_frame = h * wp * (
            cinp * itemsize + cmidp * (2 * 4 + 2 * itemsize) + coutp * itemsize
        )
    left = _VMEM_BUDGET - fixed
    bf = 8
    while bf > 1 and bf * per_frame > left:
        bf //= 2
    return bf


def _weight_specs(spec: MBConvSpec):
    cinp, cmidp, coutp = _lanes(spec.cin), _lanes(spec.cmid), _lanes(spec.cout)
    k = spec.kernel
    shapes = [
        (cinp, cmidp), (1, cmidp), (k * k, cmidp), (1, cmidp),
        (cmidp, coutp), (1, coutp),
    ]
    return [pl.BlockSpec(s, lambda i: (0, 0)) for s in shapes], shapes


# `interp` (interpret mode) is decided at forward-trace time inside the
# pallas_mode context and threaded through as a static arg: the custom-VJP
# backward traces outside the context and cannot consult the runtime gate.
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _block(xp, spec, w_real, interp, params):
    """One fused block on a pre-padded (n8, h, wp, cinp) array."""
    return _run_block_fwd(xp, spec, w_real, interp, params)


def _run_block_fwd(xp, spec, w_real, interp, params):
    cdt = xp.dtype
    n8, h, wp, cinp = xp.shape
    coutp = _lanes(spec.cout)
    bf = _frames_per_block(spec, h, wp, cdt.itemsize, backward=False)
    wops = _pad_block_weights(spec, params, cdt)
    wspecs, _ = _weight_specs(spec)
    io_spec = lambda c: pl.BlockSpec((bf, h, wp, c), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec, w_real),
        grid=(n8 // bf,),
        in_specs=[io_spec(cinp)] + wspecs,
        out_specs=io_spec(coutp),
        out_shape=jax.ShapeDtypeStruct((n8, h, wp, coutp), cdt),
        interpret=interp,
    )(xp, *wops)


def _block_vjp_fwd(xp, spec, w_real, interp, params):
    return _block(xp, spec, w_real, interp, params), (xp, params)


def _block_vjp_bwd(spec, w_real, interp, res, g):
    xp, params = res
    cdt = xp.dtype
    n8, h, wp, cinp = xp.shape
    coutp = _lanes(spec.cout)
    bf = _frames_per_block(spec, h, wp, cdt.itemsize, backward=True)
    wops = _pad_block_weights(spec, params, cdt)
    wspecs, wshapes = _weight_specs(spec)
    io_spec = lambda c: pl.BlockSpec((bf, h, wp, c), lambda i: (i, 0, 0, 0))
    acc_specs = [pl.BlockSpec(s, lambda i: (0, 0)) for s in wshapes]
    acc_shapes = [jax.ShapeDtypeStruct(s, jnp.float32) for s in wshapes]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, w_real),
        grid=(n8 // bf,),
        in_specs=[io_spec(cinp)] + wspecs + [io_spec(coutp)],
        out_specs=[io_spec(cinp)] + acc_specs,
        out_shape=[jax.ShapeDtypeStruct((n8, h, wp, cinp), cdt)] + acc_shapes,
        interpret=interp,
    )(xp, *wops, g.astype(cdt))
    dx, dwe, dbe, dwdw, dbdw, dwpr, dbp = outs
    s, k = spec, spec.kernel
    dparams = {
        "expand_conv": {
            "kernel": dwe[: s.cin, : s.cmid].reshape(1, 1, s.cin, s.cmid),
            "bias": dbe[0, : s.cmid],
        },
        "dw_conv": {
            "kernel": dwdw[:, : s.cmid].reshape(k, k, 1, s.cmid),
            "bias": dbdw[0, : s.cmid],
        },
        "project_conv": {
            "kernel": dwpr[: s.cmid, : s.cout].reshape(1, 1, s.cmid, s.cout),
            "bias": dbp[0, : s.cout],
        },
    }
    dparams = jax.tree_util.tree_map(
        lambda gacc, pv: gacc.astype(pv.dtype), dparams, params
    )
    return dx, dparams


_block.defvjp(_block_vjp_fwd, _block_vjp_bwd)


def _run_chain(x, specs, params):
    """Pad once, run the per-block kernels, slice once."""
    n, h, w, cin = x.shape
    wp = _ceil_to(w, 8)
    n8 = _ceil_to(n, 8)
    cinp = _lanes(specs[0].cin)
    interp = _rt.interpret_mode()
    xp = jnp.pad(x, ((0, n8 - n), (0, 0), (0, wp - w), (0, cinp - cin)))
    for spec, p in zip(specs, params):
        xp = _block(xp, spec, w, interp, p)
    return xp[:n, :, :w, : specs[-1].cout]


def _reference_chain(x, specs, params):
    """XLA formulation — identical math to `midas_net._mbconv` (folded BN)."""

    def conv(p, y, groups=1):
        out = jax.lax.conv_general_dilated(
            y,
            p["kernel"],
            window_strides=(1, 1),
            padding="SAME",
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + p["bias"]

    def relu6(y):
        return jnp.clip(y, 0.0, 6.0)

    for spec, p in zip(specs, params):
        shortcut = x
        y = relu6(conv(p["expand_conv"], x))
        y = relu6(conv(p["dw_conv"], y, groups=spec.cmid))
        y = conv(p["project_conv"], y)
        x = y + shortcut if spec.residual else y
    return x


def mbconv_chain(x, specs, params):
    """Run consecutive stride-1 folded-BN MBConv blocks as fused kernels.

    x: (n, h, w, cin) NHWC; specs: tuple of MBConvSpec (static); params:
    tuple of per-block dicts with torch-tree keys expand_conv/dw_conv/
    project_conv, each {kernel, bias}. Matches the encoder blocks of
    `midas_net._encoder` exactly (reference
    `flowmap/model/backbone/backbone_midas.py:50-56` via torch-hub
    MiDaS_small / EfficientNet-Lite3). Falls back to the XLA formulation
    off the kernel path.
    """
    if not _rt.kernels_enabled():
        return _reference_chain(x, specs, params)
    return _run_chain(x, specs, params)
