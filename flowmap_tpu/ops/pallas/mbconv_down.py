"""Fused stride-2 MBConv Pallas kernel (parity-split flat layout).

The stride-2 expansion blocks of the EfficientNet-Lite3 encoder (torch-hub
MiDaS_small, reference `flowmap/model/backbone/backbone_midas.py:50-56`) are
the most expensive ops in the XLA graph: the first one (24 -> 144 expand at
80x112, depthwise 3x3 stride 2, project -> 32) costs ~11.4 ms of the
reference-scale train step against a ~1.5 ms roofline — its 6x-expanded
hidden tensor is 387 MB in HBM each direction, the expand's K=24
contraction runs the MXU at ~18%, and the backward's tiny weight-gradient
reductions (f32[3,3,1,144]) get pathological tiny-tile layouts.

This kernel computes expand -> relu6 -> depthwise kxk stride 2 -> relu6 ->
project for one frame per grid step entirely in VMEM. Stride 2 is handled
by PARITY SPLITTING: the caller slices the input into its four (row, col)
parity fields at OUTPUT resolution; every depthwise tap then reads exactly
one parity field at a static lane offset of the flat layout (C on
sublanes, lanes = output rows x 128 padded columns) — the same scheme as
`head_kernel.py`. Stride-2 SAME follows the TF/XLA asymmetric convention
(pad_lo = (k-2)//2), which is what both `lax.conv_general_dilated` and the
TF-padded tf_efficientnet_lite3 weights use.

Two tricks keep Mosaic's scoped-VMEM stack (which does NOT reuse
allocations across straight-line code) inside the 16 MB budget:
- bias and halo masking are folded INTO the expand contraction — each
  field carries an extra "mask row" (1 on data lanes, 0 on padding) and
  the weight matrix an extra bias column, so halo lanes come out exactly
  zero (SAME-padding semantics) with no separate f32 bias/mask
  temporaries, and the bias/mask gradients fall out of the same dots;
- all activations round to the compute dtype exactly where the XLA
  formulation does (conv outputs), so no f32 planes persist.

The custom VJP runs VMEM-bounded kernels (project+depthwise backward
emitting the depthwise-preactivation cotangent to HBM, then one expand
backward per parity field), accumulating weight gradients in f32 output
refs across the sequential grid. Verified against the XLA
`midas_net._mbconv` formulation (value + grad, HIGHEST precision, JAX's
clip-VJP tie convention included) in interpret mode and on TPU
(tests/test_mbconv_down_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import runtime as _rt


def _prec(a):
    return jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(a),
    )


def _dot_c(a, b, contract=((1,), (0,))):
    """f32-accumulated dot rounded to the compute dtype — where XLA's conv
    output rounds (Mosaic requires a 32-bit matmul accumulator)."""
    return _dot(a, b, contract).astype(a.dtype)


def _shift(v, s):
    if s == 0:
        return v
    if s > 0:
        return jnp.pad(v[:, :-s], ((0, 0), (s, 0)))
    return jnp.pad(v[:, -s:], ((0, 0), (0, -s)))


def _clip_vjp_mask(z):
    """d clip(z, 0, 6)/dz with JAX's tie convention (0.5 at exact 0/6).

    Comparisons run in f32 (the TPU target rejects bf16 vector cmpf)."""
    zf = z.astype(jnp.float32)
    inner = ((zf > 0.0) & (zf < 6.0)).astype(z.dtype)
    ties = ((zf == 0.0) | (zf == 6.0)).astype(z.dtype)
    return inner + 0.5 * ties


def _lp_blocks(k: int) -> int:
    """Left halo row blocks: k=3 taps never reach offset -1 (TF SAME with
    stride 2 pads low by (k-2)//2 = 0), k=5 needs one."""
    return 1 if k == 5 else 0


def _pext(h2: int, k: int) -> int:
    # Max tap slice end: ((1 + lp) * 128 + 1) + p2 -> lp + 2 blocks suffice.
    return (h2 + _lp_blocks(k) + 2) * 128


def _tap_map(k: int):
    """Per-tap (parity, field offset) for TF/XLA SAME at stride 2.

    Full-res input index 2u + d - (k-2)//2 = 2m + pi selects parity field
    pi at offset m.
    """
    lo = (k - 2) // 2
    out = []
    for d in range(k):
        e = d - lo
        pi = e & 1
        out.append((pi, (e - pi) // 2))
    return out


def _tap_slice(src, a, p2):
    """src (c, p_ext) ref/value sliced at lane offset a (may be -1)."""
    if a >= 0:
        return src[:, a : a + p2]
    return _shift(src[:, 0:p2], -a)


def _field_taps(taps, lp, pi):
    """(flat tap index, lane offset) for the taps reading parity field pi."""
    out = []
    k = len(taps)
    for dy, (pr, mr) in enumerate(taps):
        for dx, (pc, mc) in enumerate(taps):
            if pr * 2 + pc == pi:
                out.append((dy * k + dx, (mr + lp) * 128 + mc))
    return out


def _field_mid(mid_ref, x_ref, weT_v, cdt):
    """clip(expand) of one augmented field into the VMEM scratch.

    Mosaic's scoped-vmem allocator is a STACK: long-lived values allocated
    above transients pin them. Processing one field at a time through a
    single-field scratch keeps the peak at one f32 dot output; holding all
    four mids as values overflows VMEM by ~8-12 MB. The mask row of the
    augmented field zeroes the folded bias on halo lanes, so they come out
    exactly zero (SAME-padding semantics).
    """
    z = _dot(weT_v.astype(cdt), x_ref[0])
    mid_ref[...] = jnp.clip(z, 0.0, 6.0).astype(cdt)


def _accum_z2(z2a_ref, mid_ref, dwwT, taps, lp, p2, x_refs, weT_v, cdt):
    """Per-field depthwise accumulation into the f32 z2 scratch."""
    z2a_ref[...] = jnp.zeros_like(z2a_ref)
    for pi in range(4):
        _field_mid(mid_ref, x_refs[pi], weT_v, cdt)
        for t, a in _field_taps(taps, lp, pi):
            w = dwwT[:, t : t + 1].astype(jnp.float32)
            # Half-lane read-modify-writes keep the f32 transients (loaded
            # accumulator + cast slice + product) at half a plane each.
            half = (p2 // 256) * 128
            for s0, e0 in ((0, half), (half, p2)):
                z2a_ref[:, s0:e0] += (
                    _tap_slice(mid_ref, a, p2)[:, s0:e0].astype(jnp.float32)
                    * w
                )


def _make_fwd_kernel(h2, w2, p2, k):
    taps = _tap_map(k)
    lp = _lp_blocks(k)

    def kern(x0, x1, x2, x3, weT, dwwT, bdwC, wpT, bpC, out_ref, mid_ref,
             z2a_ref):
        cdt = x0.dtype
        weT_v = weT[...]
        _accum_z2(
            z2a_ref, mid_ref, dwwT[...], taps, lp, p2, (x0, x1, x2, x3),
            weT_v, cdt,
        )
        z2 = z2a_ref[...].astype(cdt) + bdwC[...].astype(cdt)
        mid2 = jnp.clip(z2, 0.0, 6.0)
        y = _dot_c(wpT[...].astype(cdt), mid2) + bpC[...].astype(cdt)
        out_ref[...] = y[None].astype(out_ref.dtype)

    return kern


def _make_bwd_a_kernel(h2, w2, p2, k):
    """project + depthwise backward; emits d_z2 (dw preact cotangent)."""
    taps = _tap_map(k)
    lp = _lp_blocks(k)

    def kern(x0, x1, x2, x3, weT, dwwT, bdwC, wpT, g_ref,
             dacc_ref, ddwwT_ref, dbdw_ref, dwpT_ref, dbp_ref, mid_ref,
             z2a_ref):
        cdt = x0.dtype
        cmid = weT.shape[0]
        x_refs = (x0, x1, x2, x3)
        weT_v = weT[...]
        dww = dwwT[...]
        _accum_z2(z2a_ref, mid_ref, dww, taps, lp, p2, x_refs, weT_v, cdt)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (ddwwT_ref, dbdw_ref, dwpT_ref, dbp_ref):
                r[...] = jnp.zeros_like(r)

        bdw = bdwC[...].astype(cdt)
        g = g_ref[0]  # (cout, p2) compute dtype; zero on pad lanes
        dwpT_ref[...] += _dot(
            g, jnp.clip(z2a_ref[...].astype(cdt) + bdw, 0.0, 6.0),
            ((1,), (1,)),
        )
        dbp_ref[...] += jnp.sum(g.astype(jnp.float32), axis=1, keepdims=True)
        # Stage d_acc through the output ref, half the lanes at a time, so
        # the f32 dot output and mask transients stay at half a plane.
        halfp = (p2 // 256) * 128
        for s0, e0 in ((0, halfp), (halfp, p2)):
            dm = _dot(wpT[...], g[:, s0:e0], ((0,), (0,))).astype(cdt)
            z2h = z2a_ref[:, s0:e0].astype(cdt) + bdw
            dacc_ref[0, :, s0:e0] = (dm * _clip_vjp_mask(z2h)).astype(
                dacc_ref.dtype
            )
        dbdw_ref[...] += jnp.sum(
            dacc_ref[0].astype(jnp.float32), axis=1, keepdims=True
        )
        # Second pass: recompute each field's mid for the dw weight grads.
        half = (p2 // 256) * 128
        row_of = {}
        for pi in range(4):
            _field_mid(mid_ref, x_refs[pi], weT_v, cdt)
            for t, a in _field_taps(taps, lp, pi):
                tot = None
                for s0, e0 in ((0, half), (half, p2)):
                    sl = _tap_slice(mid_ref, a, p2)[:, s0:e0]
                    da = dacc_ref[0][:, s0:e0]
                    r = jnp.sum(
                        sl.astype(jnp.float32) * da.astype(jnp.float32),
                        axis=1,
                    )
                    tot = r if tot is None else tot + r
                row_of[t] = tot
        ddwwT_ref[...] += jnp.stack(
            [row_of[t] for t in range(len(taps) ** 2)], axis=1
        )

    return kern


def _make_bwd_b_kernel(h2, w2, p2, k, pi):
    """Expand backward for ONE parity field given d_acc.

    One pallas_call per field: Mosaic's scoped-vmem stack does not reuse
    allocations across straight-line code, so a single four-field kernel
    overflows VMEM on per-field transients.
    """
    taps = _tap_map(k)
    lp = _lp_blocks(k)
    p_ext = _pext(h2, k)
    pr_i, pc_i = divmod(pi, 2)

    def kern(x_ref, weT, dwwT, dacc_ref, dx_ref, dweT_ref, dbe_ref):
        cdt = x_ref.dtype
        x = x_ref[0]
        weT_v = weT[...]
        d_acc = dacc_ref[0]  # (cmid, p2) cdt

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dweT_ref[...] = jnp.zeros_like(dweT_ref)
            dbe_ref[...] = jnp.zeros_like(dbe_ref)

        # Transposed taps: forward read src[q + a] -> scatter d at +a.
        d_mid = None
        dww = dwwT[...]
        k_ = len(taps)
        for dy, (pr, mr) in enumerate(taps):
            for dx, (pc, mc) in enumerate(taps):
                if (pr, pc) != (pr_i, pc_i):
                    continue
                a = (mr + lp) * 128 + mc
                tap_w = dww[:, dy * k_ + dx : dy * k_ + dx + 1]
                term = d_acc * tap_w.astype(cdt)  # (cmid, p2)
                if a >= 0:
                    emb = jnp.pad(term, ((0, 0), (a, p_ext - p2 - a)))
                else:
                    # a < 0: the first -a columns scatter out of range
                    # (their cotangents are zero pad lanes anyway).
                    emb = jnp.pad(
                        term[:, -a:], ((0, 0), (0, p_ext - p2 - a))
                    )
                d_mid = emb if d_mid is None else d_mid + emb
        z1 = _dot_c(weT_v.astype(cdt), x)
        d_z1 = d_mid * _clip_vjp_mask(z1)
        # Halo lanes of d_z1 may be nonzero (clip'(0) = 0.5 passes d
        # through), but the mask row of x is zero there, so dweT/dbe stay
        # clean; the dx halo cotangents land on padding the outer
        # pad-backward discards.
        dbe_ref[...] += jnp.sum(
            (d_z1 * x[-1:, :]).astype(jnp.float32), axis=1, keepdims=True
        )
        dweT_ref[...] += _dot(d_z1, x, ((1,), (1,)))
        dx_ref[...] = _dot_c(weT_v, d_z1, ((0,), (0,)))[None].astype(
            dx_ref.dtype
        )

    return kern


def _operands(params, cin, cmid, cout, k, cdt):
    """Augmented transposed weights: expand gets a bias column that pairs
    with the fields' mask row."""
    we = params["expand_conv"]["kernel"].reshape(cin, cmid)
    be = params["expand_conv"]["bias"].reshape(cmid, 1)
    dww = params["dw_conv"]["kernel"].reshape(k * k, cmid)
    bdw = params["dw_conv"]["bias"].reshape(cmid, 1)
    wp = params["project_conv"]["kernel"].reshape(cmid, cout)
    bp = params["project_conv"]["bias"].reshape(cout, 1)
    weT_aug = jnp.concatenate([we.T, be], axis=1)  # (cmid, cin + 1)
    return (
        weT_aug.astype(cdt), dww.T.astype(cdt),
        bdw.astype(cdt), wp.T.astype(cdt), bp.astype(cdt),
    )


def _wspecs(cin, cmid, cout, k, with_project=True):
    full = lambda s: pl.BlockSpec(s, lambda i: (0, 0))
    specs = [full((cmid, cin + 1)), full((cmid, k * k))]
    if with_project:
        specs += [full((cmid, 1)), full((cout, cmid))]
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _down_core(args, spec, interp):
    return _run_fwd(args, spec, interp)


def _run_fwd(args, spec, interp):
    fields, params5 = args
    cin, cmid, cout, k, h2, w2 = spec
    p2 = h2 * 128
    p_ext = _pext(h2, k)
    n = fields[0].shape[0]
    cdt = fields[0].dtype
    io = lambda c, p: pl.BlockSpec((1, c, p), lambda i: (i, 0, 0))
    full = lambda s: pl.BlockSpec(s, lambda i: (0, 0))
    return pl.pallas_call(
        _make_fwd_kernel(h2, w2, p2, k),
        grid=(n,),
        in_specs=[io(cin + 1, p_ext)] * 4
        + _wspecs(cin, cmid, cout, k)
        + [full((cout, 1))],
        out_specs=io(cout, p2),
        out_shape=jax.ShapeDtypeStruct((n, cout, p2), cdt),
        scratch_shapes=[
            pltpu.VMEM((cmid, p_ext), cdt),
            pltpu.VMEM((cmid, p2), jnp.float32),
        ],
        interpret=interp,
    )(*fields, *params5)


def _core_fwd(args, spec, interp):
    return _down_core(args, spec, interp), args


def _core_bwd(spec, interp, res, g):
    fields, params5 = res
    cin, cmid, cout, k, h2, w2 = spec
    p2 = h2 * 128
    p_ext = _pext(h2, k)
    n = fields[0].shape[0]
    cdt = fields[0].dtype
    io = lambda c, p: pl.BlockSpec((1, c, p), lambda i: (i, 0, 0))
    full = lambda s: pl.BlockSpec(s, lambda i: (0, 0))
    weT_aug, dwwT, bdwC, wpT, bpC = params5

    a_accs = [(cmid, k * k), (cmid, 1), (cout, cmid), (cout, 1)]
    outs = pl.pallas_call(
        _make_bwd_a_kernel(h2, w2, p2, k),
        grid=(n,),
        in_specs=[io(cin + 1, p_ext)] * 4
        + _wspecs(cin, cmid, cout, k)
        + [io(cout, p2)],
        out_specs=[io(cmid, p2)] + [full(s) for s in a_accs],
        out_shape=[jax.ShapeDtypeStruct((n, cmid, p2), cdt)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in a_accs],
        scratch_shapes=[
            pltpu.VMEM((cmid, p_ext), cdt),
            pltpu.VMEM((cmid, p2), jnp.float32),
        ],
        interpret=interp,
    )(*fields, weT_aug, dwwT, bdwC, wpT, g.astype(cdt))
    dacc, ddwwT, dbdw, dwpT, dbp = outs

    b_accs = [(cmid, cin + 1), (cmid, 1)]
    dfields = []
    dweT_acc = None
    dbe_dot = None
    for pi in range(4):
        outs_b = pl.pallas_call(
            _make_bwd_b_kernel(h2, w2, p2, k, pi),
            grid=(n,),
            in_specs=[io(cin + 1, p_ext)]
            + _wspecs(cin, cmid, cout, k, with_project=False)
            + [io(cmid, p2)],
            out_specs=[io(cin + 1, p_ext)] + [full(s) for s in b_accs],
            out_shape=[jax.ShapeDtypeStruct((n, cin + 1, p_ext), cdt)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in b_accs],
            interpret=interp,
        )(fields[pi], weT_aug, dwwT, dacc)
        dfields.append(outs_b[0])
        dweT_acc = outs_b[1] if dweT_acc is None else dweT_acc + outs_b[1]
        dbe_dot = outs_b[2] if dbe_dot is None else dbe_dot + outs_b[2]
    dfields = tuple(dfields)
    # The bias column of the dweT dot includes halo-lane cotangents (mask
    # row zero there but clip'(0) = 0.5 passes d through); the separately
    # accumulated mask-row-weighted sum is the correct bias gradient.
    dweT_aug = jnp.concatenate([dweT_acc[:, :cin], dbe_dot], axis=1)

    dparams5 = (
        dweT_aug.astype(weT_aug.dtype),
        ddwwT.astype(dwwT.dtype),
        dbdw.astype(bdwC.dtype),
        dwpT.astype(wpT.dtype),
        dbp.astype(bpC.dtype),
    )
    return ((dfields, dparams5),)


_down_core.defvjp(_core_fwd, _core_bwd)


def mbconv_down(x_nhwc, params, cin, cmid, cout, kernel):
    """Stride-2 folded-BN MBConv block as a fused kernel.

    x_nhwc: (n, h, w, cin) with h, w even and w//2 <= 126; params: the
    torch-tree block dict (expand_conv/dw_conv/project_conv with folded
    biases). Returns (n, h//2, w//2, cout). Matches `midas_net._mbconv`
    with stride=2 (TF/XLA SAME) exactly in the compute dtype. Callers gate
    on `runtime.kernels_enabled()`.
    """
    n, h, w, _ = x_nhwc.shape
    assert h % 2 == 0 and w % 2 == 0 and w // 2 <= 126, (h, w)
    h2, w2 = h // 2, w // 2
    cdt = x_nhwc.dtype
    lp = _lp_blocks(kernel)

    # Tall frames run as TWO overlapping row-halves per frame — the halved
    # field slabs are self-similar (same halo structure with h2 -> h2/2),
    # which halves every kernel's VMEM working set (one whole 40x128-lane
    # frame of the first encoder block does not fit Mosaic's scoped-vmem
    # stack). The outer autodiff of the slicing below performs the
    # overlap-add of the halo gradients automatically.
    split = 2 if (h2 % 2 == 0 and h2 >= 16) else 1
    hs = h2 // split
    spec = (cin, cmid, cout, kernel, hs, w2)

    def to_fields(slab):
        # slab: (n, c, h2 + lp + 2, 128) padded rows/cols.
        if split == 1:
            return slab.reshape(n, slab.shape[1], (h2 + lp + 2) * 128)
        halves = [
            slab[:, :, j * hs : j * hs + hs + lp + 2, :] for j in (0, 1)
        ]
        return jnp.stack(halves, axis=1).reshape(
            n * 2, slab.shape[1], (hs + lp + 2) * 128
        )

    mask_slab = jnp.pad(
        jnp.ones((1, 1, h2, w2), cdt),
        ((0, 0), (0, 0), (lp, 2), (1, 127 - w2)),
    )
    mask_plane = to_fields(
        jnp.broadcast_to(mask_slab, (n, 1, h2 + lp + 2, 128))
    )
    fields = []
    for py in (0, 1):
        for px in (0, 1):
            f = x_nhwc[:, py::2, px::2, :]
            f = jnp.moveaxis(f, -1, 1)  # (n, cin, h2, w2)
            f = jnp.pad(f, ((0, 0), (0, 0), (lp, 2), (1, 127 - w2)))
            fields.append(
                jnp.concatenate([to_fields(f), mask_plane], axis=1)
            )
    params5 = _operands(params, cin, cmid, cout, kernel, cdt)
    y = _down_core((tuple(fields), params5), spec, _rt.interpret_mode())
    if split == 2:
        y = jnp.moveaxis(y.reshape(n, 2, cout, hs * 128), 1, 2)
    y = y.reshape(n, cout, h2, 128)[:, :, :, 1 : 1 + w2]
    return jnp.moveaxis(y, 1, -1)
