"""Fused MiDaS head-interior Pallas kernel.

The head tail (reference `flowmap/model/backbone/backbone_midas.py:70-71`
drives torch-hub MiDaS_small's `scratch.output_conv`) is, after the parity
composition of upsample+conv2 (`midas_net._head_up2_conv_proj`):

    z      = conv1(path1)           # 3x3, 64 -> 32, SAME (no activation)
    phases = conv_k(z)              # 3x3, 32 -> 4*32 parity kernel
    y4     = relu(phases + b2) @ w3 + b3   # per-phase scalar projection

XLA runs the two convolutions at 8-22% MXU utilization — their contraction
depths (64, 32) waste the 128-deep systolic array, and the surrounding
layouts force ~2 ms/step of relayout copies (measured ~13 ms/step total at
reference scale, 150 frames x 80x112). This kernel computes the INTERIOR
of y4 at near-full contraction depth using a FLAT layout: each frame is
one (C, (h+2)*128) matrix whose lanes enumerate (row, padded-column)
pairs. The three dy taps become tile-aligned lane slices, sublane-
concatenated into one K=3*C contraction; the three dx taps become +-1
lane shifts of the per-dx matmul outputs. Zero-padded columns (0 and
113..127 of every 128-lane row block) make the shifts reproduce
SAME-padding exactly, because matmuls map zero columns to zero columns.

Border rows/columns of y4 are NOT valid (they see zero padding where the
original sees conv2 applied to the upsample's edge clamp); the caller
splices exact border strips over them (`midas_net._head_fused`), so the
cotangents of border positions arrive as zeros from the splice's slice
backward and nothing needs masking here.

The custom VJP recomputes the forward per frame in VMEM and accumulates
weight gradients in f32 output refs across the sequential grid. Both
directions are verified against the XLA formulation (value + grad) at
HIGHEST precision in interpret mode on CPU and on TPU
(tests/test_head_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import runtime as _rt


def _prec(a):
    return jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(a),
    )


def _shift(v, s):
    """Shift flat lanes by s (out[p] = v[p - s]); zero fill."""
    if s == 0:
        return v
    if s > 0:
        return jnp.pad(v[:, :-s], ((0, 0), (s, 0)))
    return jnp.pad(v[:, -s:], ((0, 0), (0, -s)))


def _conv3x3_flat(xpad_flat, kT_dx, p_out, cdt):
    """3x3 conv on the flat layout.

    xpad_flat: (cin, p_out + 256) — the SAME-padded image, one extra
    128-lane row block on each side. kT_dx: 3 matrices (cout, 3*cin), row
    blocks dy-major. Returns ((cout, p_out) f32, patches (3*cin, p_out)).
    """
    cin = xpad_flat.shape[0]
    patches = jnp.concatenate(
        [xpad_flat[:, dy * 128 : dy * 128 + p_out] for dy in range(3)],
        axis=0,
    )
    out = None
    for dx in range(3):
        u = _shift(_dot(kT_dx[dx].astype(cdt), patches), 1 - dx)
        out = u if out is None else out + u
    return out, patches


def _fwd_math(x, k1T, b1, kpT, b2t, w3b, b3, p_out, cdt):
    """x: (64, p_out + 256) one padded frame.

    Returns (y4 (4, p_out) f32, zc (32, p_out) cdt) — zc (the biased conv1
    output) is saved to HBM so the backward skips the conv1 recompute."""
    z, _ = _conv3x3_flat(x, k1T, p_out, cdt)
    zc = (z + b1.astype(jnp.float32)[:, None]).astype(cdt)
    zpad = jnp.pad(zc, ((0, 0), (128, 128)))
    ph, _ = _conv3x3_flat(zpad, kpT, p_out, cdt)
    t = jax.nn.relu(ph + b2t.astype(jnp.float32)[:, None])
    tc = t.astype(cdt)
    y4 = _dot(w3b.astype(cdt), tc) + b3
    return y4, zc


def _fwd_kernel(p_out, x_ref, k1T0, k1T1, k1T2, b1_ref, kpT0, kpT1, kpT2,
                b2_ref, w3b_ref, b3_ref, out_ref, z_ref):
    cdt = x_ref.dtype
    y4, zc = _fwd_math(
        x_ref[0],
        (k1T0[...], k1T1[...], k1T2[...]),
        b1_ref[...][0],
        (kpT0[...], kpT1[...], kpT2[...]),
        b2_ref[...][0],
        w3b_ref[...],
        b3_ref[0, 0],
        p_out,
        cdt,
    )
    out_ref[...] = y4[None].astype(out_ref.dtype)
    z_ref[...] = zc[None]


def _scatter_center(piece, n_ch, p_out):
    """dy-stack transpose onto an UNPADDED (c, P) tensor.

    patches row-block dy reads pad(v, 128)[dy*128 : dy*128 + P], so
    d_v[p] = sum_dy piece[dy][p + (1 - dy) * 128] — tile-aligned shifts.
    """
    piece = piece.reshape(3, n_ch, p_out)
    out = None
    for dy in range(3):
        u = _shift(piece[dy], (dy - 1) * 128)
        out = u if out is None else out + u
    return out


def _scatter_padded(piece, n_ch, p_out):
    """dy-stack transpose onto the PADDED (c, P + 256) tensor:
    d_xpad[q] = sum_dy piece[dy][q - dy*128]."""
    piece = piece.reshape(3, n_ch, p_out)
    out = None
    for dy in range(3):
        u = jnp.pad(piece[dy], ((0, 0), (dy * 128, (2 - dy) * 128)))
        out = u if out is None else out + u
    return out


def _bwd_tail_kernel(p_out, zc_ref, kpT0, kpT1,
                     kpT2, b2_ref, w3b_ref, g_ref,
                     dz_ref, dkpT0, dkpT1, dkpT2, db2_ref, dw3b_ref,
                     db3_ref):
    """Backward through projection + relu + phases conv; emits dz to HBM.

    Consumes the conv1 output saved by the forward instead of recomputing
    it (and so needs neither x nor the conv1 weights)."""
    cdt = zc_ref.dtype
    kpT = (kpT0[...], kpT1[...], kpT2[...])
    zpad = jnp.pad(zc_ref[0], ((0, 0), (128, 128)))
    ph, patches2 = _conv3x3_flat(zpad, kpT, p_out, cdt)
    t = jax.nn.relu(ph + b2_ref[...][0].astype(jnp.float32)[:, None])
    tc = t.astype(cdt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dkpT0, dkpT1, dkpT2, db2_ref, dw3b_ref, db3_ref):
            r[...] = jnp.zeros_like(r)

    g = g_ref[0].astype(jnp.float32)  # (4, p_out)
    gc = g.astype(cdt)
    dw3b_ref[...] += _dot(gc, tc, ((1,), (1,)))
    db3_ref[...] += jnp.sum(g)[None, None]
    dt = _dot(w3b_ref[...], gc, ((0,), (0,)))  # (128, p_out)
    dph = jnp.where(t > 0.0, dt, 0.0)
    db2_ref[...] += jnp.sum(dph, axis=1)[None]
    dphc = dph.astype(cdt)

    dz = None
    for dx, r in ((0, dkpT0), (1, dkpT1), (2, dkpT2)):
        gsh = _shift(dphc, dx - 1)
        r[...] += _dot(gsh, patches2, ((1,), (1,)))
        piece = _dot(kpT[dx], gsh, ((0,), (0,))).astype(cdt)  # (96, p_out)
        sc = _scatter_center(piece, 32, p_out)
        dz = sc if dz is None else dz + sc
    dz_ref[...] = dz[None].astype(dz_ref.dtype)


def _bwd_conv1_kernel(p_out, x_ref, k1T0, k1T1, k1T2, dz_ref,
                      dx_ref, dk1T0, dk1T1, dk1T2, db1_ref):
    """Backward through conv1 given dz; emits dxpad."""
    cdt = x_ref.dtype
    k1T = (k1T0[...], k1T1[...], k1T2[...])
    patches1 = jnp.concatenate(
        [x_ref[0][:, dy * 128 : dy * 128 + p_out] for dy in range(3)],
        axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dk1T0, dk1T1, dk1T2, db1_ref):
            r[...] = jnp.zeros_like(r)

    dz = dz_ref[0].astype(jnp.float32)
    db1_ref[...] += jnp.sum(dz, axis=1)[None]
    dzc = dz.astype(cdt)
    dxp = None
    for dx, r in ((0, dk1T0), (1, dk1T1), (2, dk1T2)):
        gsh = _shift(dzc, dx - 1)
        r[...] += _dot(gsh, patches1, ((1,), (1,)))
        piece = _dot(k1T[dx], gsh, ((0,), (0,))).astype(cdt)  # (192, p_out)
        sp = _scatter_padded(piece, 64, p_out)
        dxp = sp if dxp is None else dxp + sp
    dx_ref[...] = dxp[None].astype(dx_ref.dtype)


def _operands(k1, b1, kp, w3_params, cdt):
    b2, w3, b3 = w3_params
    k1T = [
        k1[:, dx].transpose(2, 0, 1).reshape(32, 192).astype(cdt)
        for dx in range(3)
    ]  # rows = cout, cols = (dy-major, cin), matching the patch stacking
    kpT = [
        kp[:, dx].transpose(2, 0, 1).reshape(128, 96).astype(cdt)
        for dx in range(3)
    ]
    w3b = jnp.kron(jnp.eye(4, dtype=w3.dtype), w3[None, :]).astype(cdt)
    b1r = b1[None].astype(cdt)  # (1, 32)
    b2t = jnp.tile(b2, 4)[None].astype(cdt)  # (1, 128) phase-tiled
    b3r = jnp.reshape(b3, (1, 1)).astype(jnp.float32)
    return [*k1T, b1r, *kpT, b2t, w3b, b3r]


def _wspecs():
    full2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    return (
        [full2((32, 192))] * 3
        + [full2((1, 32))]
        + [full2((128, 96))] * 3
        + [full2((1, 128)), full2((4, 128)), full2((1, 1))]
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _head_core(x, k1, b1, kp, w3_params, interp, p_out):
    n = x.shape[0]
    cdt = x.dtype
    ops = _operands(k1, b1, kp, w3_params, cdt)
    io = lambda c, p: pl.BlockSpec((1, c, p), lambda i: (i, 0, 0))
    y4, zc = pl.pallas_call(
        functools.partial(_fwd_kernel, p_out),
        grid=(n,),
        in_specs=[io(64, p_out + 256)] + _wspecs(),
        out_specs=[io(4, p_out), io(32, p_out)],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4, p_out), jnp.float32),
            jax.ShapeDtypeStruct((n, 32, p_out), cdt),
        ],
        interpret=interp,
    )(x, *ops)
    return y4, zc


def _core_fwd(x, k1, b1, kp, w3_params, interp, p_out):
    y4, zc = _head_core(x, k1, b1, kp, w3_params, interp, p_out)
    return (y4, zc), (x, zc, k1, b1, kp, w3_params)


def _core_bwd(interp, p_out, res, g):
    x, zc, k1, b1, kp, w3_params = res
    g = g[0]  # the zc output's cotangent is zero (callers discard zc)
    b2, w3, b3 = w3_params
    n = x.shape[0]
    cdt = x.dtype
    ops = _operands(k1, b1, kp, w3_params, cdt)
    k1T_ops = ops[0:3]
    kpT_ops, b2_op, w3b_op = ops[4:7], ops[7], ops[8]
    io = lambda c, p: pl.BlockSpec((1, c, p), lambda i: (i, 0, 0))
    acc = lambda s: pl.BlockSpec(s, lambda i: (0, 0))
    full2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))

    tail_accs = [(128, 96), (128, 96), (128, 96), (1, 128), (4, 128), (1, 1)]
    outs = pl.pallas_call(
        functools.partial(_bwd_tail_kernel, p_out),
        grid=(n,),
        in_specs=[io(32, p_out)]
        + [full2((128, 96))] * 3
        + [full2((1, 128)), full2((4, 128))]
        + [io(4, p_out)],
        out_specs=[io(32, p_out)] + [acc(s) for s in tail_accs],
        out_shape=[jax.ShapeDtypeStruct((n, 32, p_out), cdt)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in tail_accs],
        interpret=interp,
    )(zc, *kpT_ops, b2_op, w3b_op, g)
    dz = outs[0]
    dkpT, db2t = outs[1:4], outs[4][0]
    dw3b, db3 = outs[5], outs[6][0, 0]

    conv1_accs = [(32, 192), (32, 192), (32, 192), (1, 32)]
    outs1 = pl.pallas_call(
        functools.partial(_bwd_conv1_kernel, p_out),
        grid=(n,),
        in_specs=[io(64, p_out + 256)]
        + [full2((32, 192))] * 3
        + [io(32, p_out)],
        out_specs=[io(64, p_out + 256)] + [acc(s) for s in conv1_accs],
        out_shape=[jax.ShapeDtypeStruct((n, 64, p_out + 256), cdt)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in conv1_accs],
        interpret=interp,
    )(x, *k1T_ops, dz)
    dx = outs1[0]
    dk1T, db1 = outs1[1:4], outs1[4][0]
    # Un-transpose the weight grads: (cout, 3dy*cin) per dx -> (3,3,cin,cout).
    dk1 = jnp.stack(
        [d.reshape(32, 3, 64).transpose(1, 2, 0) for d in dk1T], axis=1
    )
    dkp = jnp.stack(
        [d.reshape(128, 3, 32).transpose(1, 2, 0) for d in dkpT], axis=1
    )
    db2 = db2t.reshape(4, 32).sum(axis=0)
    dw3 = sum(dw3b[j, j * 32 : (j + 1) * 32] for j in range(4))
    return (
        dx.astype(x.dtype),
        dk1.astype(k1.dtype),
        db1.astype(b1.dtype),
        dkp.astype(kp.dtype),
        (
            db2.astype(b2.dtype),
            dw3.astype(w3.dtype),
            jnp.asarray(db3, b3.dtype).reshape(b3.shape),
        ),
    )


_head_core.defvjp(_core_fwd, _core_bwd)


def head_interior(features_nchw, k1, b1, kp, b2, w3, b3):
    """Interior of the parity head on NCHW features.

    features_nchw: (n, 64, h, w) with 1 <= w <= 126; k1 (3,3,64,32); kp
    (3,3,32,128) the parity-composed kernel; b2 (32,) / w3 (32,) / b3
    scalar-shaped tail params. Returns y4 (n, 4, h, w) f32 (phase index
    2*p+q) whose border rows/columns are NOT valid — the caller overwrites
    them with the exact strips. Kernel path only; callers gate on
    `runtime.kernels_enabled()` and fall back to the XLA formulation.
    """
    n, c, h, w = features_nchw.shape
    assert c == 64 and 1 <= w <= 126, (c, w)
    # NB placement-matrix einsums for this pad+flatten measured ~1 ms/step
    # SLOWER than the jnp.pad + reshape chain at reference scale.
    xp = jnp.pad(features_nchw, ((0, 0), (0, 0), (1, 1), (1, 127 - w)))
    xf = xp.reshape(n, 64, (h + 2) * 128)
    p_out = h * 128
    y4, _ = _head_core(
        xf, k1, b1, kp, (b2, w3, b3), _rt.interpret_mode(), p_out
    )
    return y4.reshape(n, 4, h, 128)[:, :, :, 1 : 1 + w]
