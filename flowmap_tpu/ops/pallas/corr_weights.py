"""Fused correspondence-weight kernel: upsample + warp + MLP in one pass.

The MiDaS backbone's features feed exactly one consumer: the per-pixel
correspondence-weight MLP (reference `backbone_midas.py:57-64,75-127` —
warped earlier features + later features -> sigmoid weight). The unfused
pipeline materializes, at full resolution and per frame pair, the upsampled
features (x2 bilinear), the warped features, and two MLP activations —
~300 ms/step at reference scale (150 frames, 160x224), ~80% of the whole
optimization step. This kernel computes the weights directly from the
NATIVE-resolution feature maps (h/2, w/2, the MiDaS decoder output), fusing:

  1. the x2 bilinear upsample (align_corners=False, edge clamp) — composed
     ANALYTICALLY with the warp: a bilinear sample of the upsampled field at
     full-res position x is a <=3-tap interpolation of native columns, whose
     weights are arithmetic functions of x (parity of the integer tap);
  2. the bilinear displacement warp (zeros padding, frozen flow) for the
     earlier frame, and the static upsample for the later frame;
  3. the weight MLP (split first layer + ReLU stack + sigmoid, clip).

TPU structure (per (frame pair, block of output rows) program):

- Features arrive column-major flattened ((f, 128, hp*c)) with replicated
  edge padding, so upsample border clamping becomes plain indexing and the
  horizontal contraction dim is exactly 128 lanes; row windows are DMA'd as
  lane slices aligned to PAIRS of native rows (native c=64, so a row pair is
  one 128-lane unit — no 64-offset slice ever materializes).
- Per output row, the horizontal interpolation matrix (out_cols x 128) is
  built in VMEM from iota comparisons (4 arithmetic one-hot taps: 2 full-res
  taps x 2 native taps each) and contracted against the row's native-row
  window on the MXU; vertical weights fold in as lane-pair broadcasts, and
  the pair structure is folded into the MLP by stacking its first-layer
  weights twice (sum over a lane pair commutes with the channel
  contraction).
- The MLP tail runs per row; the final logit row is produced directly in
  (1, out_cols) layout by contracting from the LEFT (dot_general with the
  pixel dim as rhs free dim), so no (N, 1) -> (rows, cols) relayout exists.
- Only the final (block, out_cols) sigmoid weights are written to HBM.

HBM traffic: native features in (with window overlap), weights out. No
full-resolution intermediate exists anywhere.

Backward (custom_vjp; the flow grid is frozen upstream — its cotangent is
zero): a transposed-structure kernel over native row blocks recomputes the
forward for the contributing output rows and emits (a) the earlier-frame
feature cotangent via the transposed interpolation matrices, (b) the
later-frame cotangent via the transposed static upsample, and (c) per-frame
MLP weight-gradient partials accumulated across row blocks (summed outside).

Off-TPU, `corr_weights` falls back to `corr_weights_ref`, the XLA
composition of the existing ops (resize_bilinear + warp + einsum MLP), which
is also the parity oracle for the kernels (tests/test_corr_weights.py).
"""

from __future__ import annotations

import functools

import jax
from . import runtime as _rt
import jax.numpy as jnp
from jaxtyping import Array, Float

# Native-resolution feature channel count (MiDaS decoder width).
_C = 64
# Replicated-edge row padding: absorbs upsample border clamping and the
# warp window's excursion past the image (supports radius <= 6; larger
# displacements fall back to the unfused path). Even, and sized so the
# padded height is a multiple of the backward kernel's row blocks.
_PADY = 8
_MAX_RADIUS = 6

_BLOCK = 16  # output rows per program


def _hit(delta):
    """max(0, 1 - |delta|): arithmetic one-hot for integer deltas in f32."""
    return jnp.maximum(1.0 - jnp.abs(delta), 0.0)


# ---------------------------------------------------------------------------
# Reference implementation (oracle + CPU fallback)
# ---------------------------------------------------------------------------


def mlp_weights_ref(warped, later, mlp_params):
    """The reference MLP tail on already-sampled features.

    warped/later: (n, c, h, w); returns (n, h, w) f32 weights. Mirrors
    `backbone_midas.apply_midas` (split first layer, relu stack, sigmoid).
    """
    c = warped.shape[1]
    layer0 = mlp_params[0]
    w_a = layer0["kernel"][:c]
    w_b = layer0["kernel"][c:]
    x = (
        jnp.einsum("nchw,ck->nhwk", warped, w_a)
        + jnp.einsum("nchw,ck->nhwk", later, w_b)
        + layer0["bias"]
    )
    x = jax.nn.relu(x)
    for i, layer in enumerate(mlp_params[1:]):
        x = x @ layer["kernel"] + layer["bias"]
        if i + 1 < len(mlp_params) - 1:
            x = jax.nn.relu(x)
    logits = x.astype(jnp.float32)
    return jnp.clip(jax.nn.sigmoid(logits[..., 0]), min=1e-4)


def corr_weights_ref(features_nhwc, grid, mlp_params, radius):
    """XLA composition: resize x2 -> /20 -> warp earlier -> MLP.

    features_nhwc: (f, hn, wn, c) native-resolution decoder features;
    grid: (f-1, h, w, 2) in [-1, 1] (earlier-frame sample positions);
    mlp_params: list of {"kernel", "bias"} (first kernel (2c, hidden)).
    Returns (f-1, h, w) f32.
    """
    from ..resize import resize_bilinear
    from ..warp import warp_bilinear_matmul

    f, hn, wn, c = features_nhwc.shape
    h, w = 2 * hn, 2 * wn
    feats = jnp.transpose(features_nhwc, (0, 3, 1, 2))
    feats = resize_bilinear(feats, (h, w)) / 20.0
    warped = warp_bilinear_matmul(
        feats[:-1], grid.astype(feats.dtype), radius=radius
    )
    return mlp_weights_ref(warped, feats[1:], mlp_params)


# ---------------------------------------------------------------------------
# Shared host-side preparation
# ---------------------------------------------------------------------------


def _pack_features(features_nhwc):
    """Replicate-pad to (f, hp, 128, c) and flatten column-major.

    Returns ((f, 128, hp*c), padx): lanes are (native row, channel) pairs,
    sublanes are native columns — a native-row window is a lane slice.
    """
    f, hn, wn, c = features_nhwc.shape
    assert c == _C, (c,)
    assert wn <= 128, (wn,)
    padx = (128 - wn) // 2
    x = jnp.pad(
        features_nhwc,
        ((0, 0), (_PADY, _PADY), (padx, 128 - wn - padx), (0, 0)),
        mode="edge",
    )
    hp = hn + 2 * _PADY
    return x.transpose(0, 2, 1, 3).reshape(f, 128, hp * c), padx


def _grid_params(grid, h, w):
    """Integer/frac sample parameters from a [-1, 1] grid (f32)."""
    x = ((grid[..., 0].astype(jnp.float32) + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1].astype(jnp.float32) + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return (
        x0.astype(jnp.int32),
        (x - x0).astype(jnp.float32),
        y0.astype(jnp.int32),
        (y - y0).astype(jnp.float32),
    )


def _pack_mlp(mlp_params, dtype):
    """Fold /20 into the first layer; stack for lane-pair accumulators; pad
    the tail layers to 128 lanes (zero rows/cols keep the math exact)."""
    l0, l1, l2 = mlp_params
    k0 = l0["kernel"].astype(jnp.float32) / 20.0
    w_a = k0[:_C]
    w_b = k0[_C:]
    w_a2 = jnp.concatenate([w_a, w_a], axis=0).astype(dtype)
    w_b2 = jnp.concatenate([w_b, w_b], axis=0).astype(dtype)
    k1 = l1["kernel"]
    w1 = jnp.zeros((128, 128), jnp.float32).at[: k1.shape[0], : k1.shape[1]].set(
        k1.astype(jnp.float32)
    ).astype(dtype)
    b1 = jnp.zeros((128,), jnp.float32).at[: l1["bias"].shape[0]].set(
        l1["bias"].astype(jnp.float32)
    )
    k2 = l2["kernel"]
    w2 = jnp.zeros((128, 8), jnp.float32).at[: k2.shape[0], : k2.shape[1]].set(
        k2.astype(jnp.float32)
    ).astype(dtype)
    b2 = jnp.asarray(l2["bias"], jnp.float32).reshape(())
    return (
        w_a2,
        w_b2,
        l0["bias"].astype(jnp.float32),
        w1,
        b1,
        w2,
        b2,
    )


def _row_lo(row, radius):
    """First padded native row of an output row's warp window (pair-even)."""
    return ((((row - radius) >> 1) - 1 + _PADY)) & ~1


def _row_hi(row, radius):
    """Last padded native row (inclusive) of the window."""
    return ((row + radius + 2) >> 1) + 1 + _PADY


def _window_geometry(radius, block):
    """Static (per-row span, whole-block rows) in padded native rows.

    The block window must cover every row's (pair-aligned) span slice:
    total = max_r (off_r + span), where off_r = row_lo(r) - row_lo(0).
    """
    span = max(
        _row_hi(r, radius) - _row_lo(r, radius) + 1 for r in range(block)
    )
    span += span & 1
    total = max(
        _row_lo(r, radius) - _row_lo(0, radius) + span for r in range(block)
    )
    total += total & 1
    return span, total


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _expand_taps(q, wq, size_full, pad):
    """Full-res tap (q int, weight wq) -> two native taps [(idx, w), ...].

    Native position of full index q is q/2 - 0.25: even q = 2m interpolates
    0.25*F[m-1] + 0.75*F[m]; odd q = 2m+1 gives 0.75*F[m] + 0.25*F[m+1]
    (edge clamping is absorbed by the replicated padding). Out-of-image q
    contributes nothing (warp zeros padding). Indices are padded coords.
    """
    qf = q.astype(jnp.float32)
    valid = jnp.clip(qf + 1.0, 0.0, 1.0) * jnp.clip(size_full - qf, 0.0, 1.0)
    par = q - 2 * (q >> 1)
    i0 = (q >> 1) - 1 + par + pad
    t = 0.75 - 0.5 * par.astype(jnp.float32)
    w = wq * valid
    return [(i0, w * (1.0 - t)), (i0 + 1, w * t)]


def _later_geometry(base, block):
    """Static later-frame window (padded native rows, pair-even)."""
    lat_lo = (((base >> 1) - 1 + _PADY)) & ~1
    lat_hi = ((base + block - 1) >> 1) + 1 + _PADY
    lat_rows = lat_hi - lat_lo + 1
    lat_rows += lat_rows & 1
    return lat_lo, lat_rows


def _mlp_row(acc_w, acc_l, wa2, wb2, b0, w1, b1, w2, b2, dtype):
    """One output row's MLP: (wf, 128) pair-accumulators -> (1, wf) logits."""
    h0 = (
        jnp.dot(acc_w.astype(dtype), wa2, preferred_element_type=jnp.float32)
        + jnp.dot(acc_l.astype(dtype), wb2, preferred_element_type=jnp.float32)
        + b0
    )
    h0 = jnp.maximum(h0, 0.0).astype(dtype)
    h1 = jnp.maximum(
        jnp.dot(h0, w1, preferred_element_type=jnp.float32) + b1, 0.0
    ).astype(dtype)
    # Contract from the left so the pixel dim lands in lanes: (8, wf).
    logits = jax.lax.dot_general(
        w2,
        h1,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return logits[0:1] + b2  # (1, wf)


def _forward_kernel(
    block,
    radius,
    hf,
    wf,
    padx,
    span,
    x0_ref,
    tx_ref,
    y0_ref,
    ty_ref,
    wa2_ref,
    wb2_ref,
    b0_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    f_hbm,
    b2_scalar,
    out_ref,
    fe_vmem,
    fl_vmem,
    sem,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = _C
    i = pl.program_id(0)  # frame pair
    j = pl.program_id(1)  # row block
    base_val = j * block

    win_rows = fe_vmem.shape[-1] // c
    lat_rows = fl_vmem.shape[-1] // c

    # Padded-native window starts. These involve the runtime j, but all are
    # multiples of the pair size by construction (block even, pair-even
    # rounding). The HBM slice offsets are written as pair_index * 128 so
    # Mosaic can PROVE lane-tile divisibility (win_lo * c with c = 64 is
    # equal but unprovable — the rounding obscures the factor of 2).
    win_pair = (((base_val - radius) >> 1) - 1 + _PADY) >> 1  # >= 0 (host assert)
    win_lo = win_pair * 2
    lat_pair = ((base_val >> 1) - 1 + _PADY) >> 1
    lat_lo = lat_pair * 2

    pltpu.make_async_copy(
        f_hbm.at[i, :, pl.ds(win_pair * (2 * c), win_rows * c)],
        fe_vmem,
        sem.at[0],
    ).start()
    pltpu.make_async_copy(
        f_hbm.at[i + 1, :, pl.ds(lat_pair * (2 * c), lat_rows * c)],
        fl_vmem,
        sem.at[1],
    ).start()
    pltpu.make_async_copy(
        f_hbm.at[i, :, pl.ds(win_pair * (2 * c), win_rows * c)],
        fe_vmem,
        sem.at[0],
    ).wait()
    pltpu.make_async_copy(
        f_hbm.at[i + 1, :, pl.ds(lat_pair * (2 * c), lat_rows * c)],
        fl_vmem,
        sem.at[1],
    ).wait()

    dtype = f_hbm.dtype
    cols = jax.lax.broadcasted_iota(jnp.int32, (wf, 128), 1)
    # Lane q of a window tensor belongs to padded native row (q // c) —
    # evaluating the vertical tap weights densely over all span*c lanes in
    # one pass replaces a per-pair loop of (wf, 1) ops, each of which costs
    # as much as a full (wf, 128) op on the VPU.
    slot_rel = (
        jax.lax.broadcasted_iota(jnp.int32, (wf, span * c), 1) // c
    ).astype(jnp.float32)
    lanef = jax.lax.broadcasted_iota(jnp.int32, (wf, 2 * c), 1).astype(
        jnp.float32
    )
    lo_mask = jnp.clip(jnp.float32(c) - lanef, 0.0, 1.0)
    hi_mask = 1.0 - lo_mask

    # Static horizontal upsample matrix for the later branch (taps of the
    # output pixels themselves).
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (wf, 1), 0)
    wx_later = jnp.zeros((wf, 128), jnp.float32)
    for idx, wgt in _expand_taps(out_cols, 1.0, wf, padx):
        wx_later = wx_later + _hit(cols - idx) * wgt
    ol = jnp.dot(
        wx_later.astype(dtype),
        fl_vmem[...],
        preferred_element_type=jnp.float32,
    )  # (wf, lat_rows*c) column-interpolated later rows, every slot

    for r in range(block):
        x0 = x0_ref[0, r, :][:, None]
        tx = tx_ref[0, r, :][:, None]
        y0 = y0_ref[0, r, :][:, None]
        ty = ty_ref[0, r, :][:, None]

        wx = jnp.zeros((wf, 128), jnp.float32)
        for dq, wq in ((0, 1.0 - tx), (1, tx)):
            for idx, wgt in _expand_taps(x0 + dq, wq, wf, padx):
                wx = wx + _hit(cols - idx) * wgt

        # Row window offset within the block window (static per r given the
        # pair-even rounding; base parity does not shift pair boundaries).
        off = _row_lo(r, radius) - _row_lo(0, radius)
        ow = jnp.dot(
            wx.astype(dtype),
            fe_vmem[:, pl.ds(off * c, span * c)],
            preferred_element_type=jnp.float32,
        )  # (wf, span*c)

        # Vertical taps (data-dependent): dense lane evaluation over the
        # whole window, then a pair-summed reduction of wy * ow.
        taps = []
        for dq, wq in ((0, 1.0 - ty), (1, ty)):
            taps.extend(_expand_taps(y0 + dq, wq, hf, _PADY))
        row_lo_abs = win_lo + off
        rowf = slot_rel + row_lo_abs.astype(jnp.float32)
        wy_full = jnp.zeros((wf, span * c), jnp.float32)
        for idx, wgt in taps:
            wy_full = wy_full + _hit(idx.astype(jnp.float32) - rowf) * wgt
        prod = wy_full * ow
        acc_w = prod[:, 0 : 2 * c]
        for p in range(1, span // 2):
            acc_w = acc_w + prod[:, 2 * p * c : (2 * p + 2) * c]

        # Later branch: static vertical taps of output row base + r. With
        # block % 4 == 0, base >> 1 is even, so lat_lo = (base >> 1) +
        # (_PADY - 2) exactly, and the tap offset depends only on r:
        # l0_abs = ((base + r) >> 1) - 1 + parity(r) + _PADY
        #        = lat_lo + (r >> 1) + parity(r) + 1.
        parr = r & 1
        l0_off = (r >> 1) + parr + 1  # static python int
        tl = 0.75 - 0.5 * parr
        p0 = l0_off // 2
        in_hi = l0_off & 1
        pair0 = ol[:, p0 * 2 * c : (p0 + 1) * 2 * c]
        if in_hi:
            pair1 = ol[:, (p0 + 1) * 2 * c : (p0 + 2) * 2 * c]
            acc_l = pair0 * (hi_mask * (1.0 - tl)) + pair1 * (lo_mask * tl)
        else:
            acc_l = pair0 * (lo_mask * (1.0 - tl) + hi_mask * tl)

        logits = _mlp_row(
            acc_w,
            acc_l,
            wa2_ref[...],
            wb2_ref[...],
            b0_ref[0],
            w1_ref[...],
            b1_ref[0],
            w2_ref[...],
            b2_scalar[0, 0],
            dtype,
        )
        out_ref[0, r] = jnp.clip(jax.nn.sigmoid(logits), 1e-4, None)[0]


def _run_forward(packed, x0, tx, y0, ty, mlp, radius, hf, wf, padx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x0.shape[0]
    block = _BLOCK
    assert hf % block == 0, (hf, block)
    assert block % 4 == 0
    span, total = _window_geometry(radius, block)
    hp = packed.shape[-1] // _C
    assert _row_lo(0, radius) >= 0, radius
    # Top block's DMA window must stay inside the padded array.
    max_base = hf - block
    assert (max_base // 2) + _row_lo(0, radius) + total <= hp, (radius, hp)

    # Later-frame window: fixed 6 pairs covers block=16 (see kernel note).
    lat_lo0, lat_rows = _later_geometry(0, block)

    w_a2, w_b2, b0, w1, b1, w2, b2 = mlp

    kernel = functools.partial(
        _forward_kernel, block, radius, hf, wf, padx, span
    )
    grid = (n, hf // block)
    row_spec = pl.BlockSpec((1, block, wf), lambda i, j: (i, j, 0))

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j, s=len(shape): (0,) * s)

    out = _rt.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hf, wf), jnp.float32),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            row_spec,
            full(w_a2.shape),
            full(w_b2.shape),
            full((1, b0.shape[0])),
            full(w1.shape),
            full((1, b1.shape[0])),
            full(w2.shape),
            pl.BlockSpec(memory_space=pltpu.ANY),
            full((1, 1)),
        ],
        out_specs=pl.BlockSpec((1, block, wf), lambda i, j: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((128, total * _C), packed.dtype),
            pltpu.VMEM((128, lat_rows * _C), packed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        x0,
        tx,
        y0,
        ty,
        w_a2,
        w_b2,
        b0[None],
        w1,
        b1[None],
        w2,
        packed,
        b2.reshape(1, 1),
    )
    return out


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

_NBN = 32  # owned native rows (fwd-padded coords) per backward program


def _bwd_geometry(radius, hp, hf):
    """Static geometry for the backward kernel (python ints).

    Returns (nbn, jn, OFF, YLEN, fe_len, fl_len, fl_lo_rel, bot_pad_fe,
    bot_pad_fl, row_pad_top, row_pad_bot).
    """
    nbn = next(b for b in (_NBN, 16, 8, 4) if hp % b == 0)
    jn = hp // nbn
    # Window of output rows per program: ys(jb) = 2*jb*nbn - OFF. OFF is a
    # multiple of 4 so ys//2 stays even (pair-aligned static offsets).
    off = ((2 * _PADY + radius + 6) + 3) & ~3
    ylen = 2 * nbn + 2 * radius + 16
    ylen = (ylen + 7) & ~7
    assert ylen >= (off - 2 * _PADY) + 2 * nbn + radius + 3
    # Warp feature window (relative fwd-padded rows, like the forward).
    span, total = _window_geometry(radius, ylen)
    fe_len = total
    # Later-frame taps: l0_rel(r) = (r >> 1) + (r & 1) - 1 + _PADY relative
    # to ys//2; window start pair-aligned.
    l0s = [(r >> 1) + (r & 1) - 1 + _PADY for r in range(ylen)]
    fl_lo_rel = min(l0s) & ~1
    fl_len = (max(l0s) + 1) - fl_lo_rel + 1
    fl_len += fl_len & 1
    # Padding so every program's DMA stays in bounds. fe slot 0 sits at
    # fwd-padded row jb*nbn - off//2 + row_lo(0); top pad brings jb=0 to 0.
    fe_top = off // 2 - _row_lo(0, radius)
    assert fe_top >= 0 and fe_top % 2 == 0, fe_top
    fe_bot = max(0, (jn - 1) * nbn - off // 2 + _row_lo(0, radius) + fe_len - hp)
    fe_bot += fe_bot & 1
    fl_top = off // 2 - fl_lo_rel
    assert fl_top >= 0 and fl_top % 2 == 0, fl_top
    fl_bot = max(0, (jn - 1) * nbn - off // 2 + fl_lo_rel + fl_len - hp)
    fl_bot += fl_bot & 1
    # g / sample-param rows: window rows ys + [0, ylen) with ys in
    # [-off, 2*(jn-1)*nbn - off]; pad to [0, ...).
    row_top = off
    row_bot = max(0, 2 * (jn - 1) * nbn - off + ylen - hf)
    return nbn, jn, off, ylen, fe_len, fl_len, fl_lo_rel, fe_top, fe_bot, fl_top, fl_bot, row_top, row_bot


def _relu_mask(x):
    return jnp.clip(jnp.sign(x), 0.0, 1.0)


def _backward_kernel(
    # static
    nbn,
    radius,
    off,
    ylen,
    fl_lo_rel,
    hf,
    wf,
    padx,
    span,
    # refs
    x0_ref,
    tx_ref,
    y0_ref,
    ty_ref,
    g_ref,
    wa2_ref,
    wb2_ref,
    b0_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    wa2t_ref,
    wb2t_ref,
    w1t_ref,
    w2c_ref,
    fe_hbm,
    fl_hbm,
    b2_scalar,
    # outputs
    dfe_ref,
    dfl_ref,
    dW_ref,
    # scratch
    fe_vmem,
    fl_vmem,
    sem,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = _C
    i = pl.program_id(0)
    jb = pl.program_id(1)
    base_row = jb * nbn  # first owned fwd-padded native row

    fe_len = fe_vmem.shape[-1] // c
    fl_len = fl_vmem.shape[-1] // c

    # Manual DMAs cover only the feature windows (lane slices whose offsets
    # are single-constant multiples of the program id, so Mosaic can prove
    # 128-lane divisibility: nbn * c is a multiple of 128 for nbn >= 2). The
    # g/sample-parameter row windows overlap between programs — they arrive
    # pre-windowed host-side as (n, jn, ylen, wf) BlockSpec blocks (a lane
    # slice of wf = 224 is not tile-alignable; BlockSpec blocks are).
    copies = [
        (fe_hbm.at[i, :, pl.ds(jb * (nbn * c), fe_len * c)], fe_vmem),
        (fl_hbm.at[i + 1, :, pl.ds(jb * (nbn * c), fl_len * c)], fl_vmem),
    ]
    for k, (src, dst) in enumerate(copies):
        pltpu.make_async_copy(src, dst, sem.at[k]).start()
    for k, (src, dst) in enumerate(copies):
        pltpu.make_async_copy(src, dst, sem.at[k]).wait()

    dtype = fe_hbm.dtype
    cols = jax.lax.broadcasted_iota(jnp.int32, (wf, 128), 1)
    lanef = jax.lax.broadcasted_iota(jnp.int32, (wf, 2 * c), 1).astype(
        jnp.float32
    )
    lo_mask = jnp.clip(jnp.float32(c) - lanef, 0.0, 1.0)
    hi_mask = 1.0 - lo_mask
    lane0 = jnp.clip(1.0 - lanef, 0.0, 1.0)  # (wf, 128) col-0 selector
    # Dense vertical-tap lane grid (see the forward kernel's slot_rel note).
    slot_rel = (
        jax.lax.broadcasted_iota(jnp.int32, (wf, span * c), 1) // c
    ).astype(jnp.float32)

    out_cols = jax.lax.broadcasted_iota(jnp.int32, (wf, 1), 0)
    wx_later = jnp.zeros((wf, 128), jnp.float32)
    for idx, wgt in _expand_taps(out_cols, 1.0, wf, padx):
        wx_later = wx_later + _hit(cols - idx) * wgt
    wx_later = wx_later.astype(dtype)

    # Per-pair accumulators as python lists: `.at[slice].add` lowers to
    # scatter-add, which Mosaic does not implement — list elements become
    # plain VMEM registers and the final store concatenates them.
    dfe_pairs = [jnp.zeros((128, 2 * c), jnp.float32) for _ in range(nbn // 2)]
    dfl_pairs = [jnp.zeros((128, 2 * c), jnp.float32) for _ in range(nbn // 2)]
    dwa2 = jnp.zeros((128, 128), jnp.float32)
    dwb2 = jnp.zeros((128, 128), jnp.float32)
    dw1 = jnp.zeros((128, 128), jnp.float32)
    dw2 = jnp.zeros((128, 128), jnp.float32)
    db0 = jnp.zeros((1, 128), jnp.float32)
    db1 = jnp.zeros((1, 128), jnp.float32)
    db2 = jnp.zeros((1, 128), jnp.float32)

    ones_col = jnp.ones((wf, 1), dtype)

    # Static fwd-geometry offsets shared by all rows.
    row_lo0 = _row_lo(0, radius)

    for r in range(ylen):
        # ---- recompute the forward row (same algebra as _forward_kernel,
        # with the padded-row data; zero-g rows contribute nothing).
        x0 = x0_ref[0, 0, r, :][:, None]
        tx = tx_ref[0, 0, r, :][:, None]
        y0 = y0_ref[0, 0, r, :][:, None]
        ty = ty_ref[0, 0, r, :][:, None]
        g_row = g_ref[0, 0, r, :][:, None]  # (wf, 1) f32

        wx = jnp.zeros((wf, 128), jnp.float32)
        for dq, wq in ((0, 1.0 - tx), (1, tx)):
            for idx, wgt in _expand_taps(x0 + dq, wq, wf, padx):
                wx = wx + _hit(cols - idx) * wgt
        wx = wx.astype(dtype)

        off_r = _row_lo(r, radius) - row_lo0
        ow = jnp.dot(
            wx,
            fe_vmem[:, pl.ds(off_r * c, span * c)],
            preferred_element_type=jnp.float32,
        )

        taps = []
        for dq, wq in ((0, 1.0 - ty), (1, ty)):
            taps.extend(_expand_taps(y0 + dq, wq, hf, _PADY))
        # Absolute fwd-padded row of this row's window start: the jb*nbn
        # runtime offset cancels in (idx - s) comparisons only when both are
        # absolute; reconstruct absolute slot rows from base_row.
        row_lo_abs = base_row - (off // 2) + _row_lo(r, radius)
        rowf = slot_rel + row_lo_abs.astype(jnp.float32)
        wy_full = jnp.zeros((wf, span * c), jnp.float32)
        for idx, wgt in taps:
            wy_full = wy_full + _hit(idx.astype(jnp.float32) - rowf) * wgt
        prod = wy_full * ow
        acc_w = prod[:, 0 : 2 * c]
        for p in range(1, span // 2):
            acc_w = acc_w + prod[:, 2 * p * c : (2 * p + 2) * c]

        l0_rel = (r >> 1) + (r & 1) - 1 + _PADY
        parr = r & 1
        tl = 0.75 - 0.5 * parr
        lp = l0_rel - fl_lo_rel
        p0 = lp // 2
        in_hi = lp & 1
        ol0 = jnp.dot(
            wx_later,
            fl_vmem[:, pl.ds(p0 * 2 * c, 2 * c)],
            preferred_element_type=jnp.float32,
        )
        if in_hi:
            ol1 = jnp.dot(
                wx_later,
                fl_vmem[:, pl.ds((p0 + 1) * 2 * c, 2 * c)],
                preferred_element_type=jnp.float32,
            )
            acc_l = ol0 * (hi_mask * (1.0 - tl)) + ol1 * (lo_mask * tl)
            l_w0, l_w1 = hi_mask * (1.0 - tl), lo_mask * tl
        else:
            acc_l = ol0 * (lo_mask * (1.0 - tl) + hi_mask * tl)
            l_w0 = lo_mask * (1.0 - tl) + hi_mask * tl
            l_w1 = None

        h0pre = (
            jnp.dot(
                acc_w.astype(dtype), wa2_ref[...],
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                acc_l.astype(dtype), wb2_ref[...],
                preferred_element_type=jnp.float32,
            )
            + b0_ref[0]
        )
        h0a = jnp.maximum(h0pre, 0.0).astype(dtype)
        h1pre = (
            jnp.dot(h0a, w1_ref[...], preferred_element_type=jnp.float32)
            + b1_ref[0]
        )
        h1a = jnp.maximum(h1pre, 0.0).astype(dtype)
        logit = (
            jnp.dot(h1a, w2_ref[...], preferred_element_type=jnp.float32)[
                :, :1
            ]
            + b2_scalar[0, 0]
        )  # (wf, 1)
        sig = jax.nn.sigmoid(logit)

        # ---- gradient chain.
        dlogit = (
            g_row
            * sig
            * (1.0 - sig)
            * jnp.clip(jnp.sign(sig - 1e-4), 0.0, 1.0)
        )  # (wf, 1) f32
        g_h1 = (dlogit * w2c_ref[...]) * _relu_mask(h1pre)  # (wf, 128)
        g_h0 = (
            jnp.dot(
                g_h1.astype(dtype), w1t_ref[...],
                preferred_element_type=jnp.float32,
            )
            * _relu_mask(h0pre)
        )
        g_h0c = g_h0.astype(dtype)
        g_accw = jnp.dot(
            g_h0c, wa2t_ref[...], preferred_element_type=jnp.float32
        )
        g_accl = jnp.dot(
            g_h0c, wb2t_ref[...], preferred_element_type=jnp.float32
        )

        # ---- dFe: transposed warp into owned pairs. Owned pair p_own sits
        # at window slot 2*p_own + off//2 - _row_lo(r) (static, even; the
        # jb*nbn offset cancels); pairs outside [0, span-2] have zero tap
        # weight by the window-coverage construction.
        for p_own in range(nbn // 2):
            slot = 2 * p_own + off // 2 - _row_lo(r, radius)
            if slot < 0 or slot > span - 2:
                continue
            wy_pair = wy_full[:, slot * c : (slot + 2) * c]
            m = jax.lax.dot_general(
                wx,
                (wy_pair * g_accw).astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, 2c)
            dfe_pairs[p_own] = dfe_pairs[p_own] + m

        # ---- dFl: transposed static upsample into owned pairs.
        tgt0 = l0_rel - off // 2  # owned-relative row of tap pair p0's even
        # tap rows are l0_abs = base_row + tgt0 (+1): map to owned pairs.
        for tap_pair, l_w in (((lp) // 2, l_w0), ((lp // 2) + 1, l_w1)):
            if l_w is None:
                continue
            own_rel = (tap_pair * 2 + fl_lo_rel) - off // 2 - 0  # even row
            own_pair = own_rel // 2
            if own_rel % 2 != 0:
                raise AssertionError("pair misalignment")
            if own_pair < 0 or own_pair >= nbn // 2:
                continue
            ml = jax.lax.dot_general(
                wx_later,
                (l_w * g_accl).astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dfl_pairs[own_pair] = dfl_pairs[own_pair] + ml

        # ---- weight grads (owned output rows only: exactly-once).
        r_owned0 = off - 2 * _PADY
        if r_owned0 <= r < r_owned0 + 2 * nbn:
            g_h1c = g_h1.astype(dtype)
            dwa2 = dwa2 + jax.lax.dot_general(
                acc_w.astype(dtype),
                g_h0c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwb2 = dwb2 + jax.lax.dot_general(
                acc_l.astype(dtype),
                g_h0c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw1 = dw1 + jax.lax.dot_general(
                h0a,
                g_h1c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw2 = dw2 + jax.lax.dot_general(
                h1a,
                (dlogit * lane0).astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sums = jax.lax.dot_general(
                ones_col,
                jnp.concatenate(
                    [
                        g_h0.astype(dtype),
                        g_h1c,
                        (dlogit * lane0).astype(dtype),
                    ],
                    axis=1,
                ),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, 384)
            db0 = db0 + sums[:, :128]
            db1 = db1 + sums[:, 128:256]
            db2 = db2 + sums[:, 256:384]

    dfe_ref[0] = jnp.concatenate(dfe_pairs, axis=1).astype(dfe_ref.dtype)
    dfl_ref[0] = jnp.concatenate(dfl_pairs, axis=1).astype(dfl_ref.dtype)
    # Pack weight grads: rows 0:128 wa2 | 128:256 wb2 | 256:384 w1 |
    # 384:512 w2 | 512:520 biases. The dW output block index is constant in
    # jb, so the block stays resident across row blocks: initialize on the
    # first visit, accumulate on the rest.
    @pl.when(jb == 0)
    def _():
        dW_ref[0] = jnp.zeros_like(dW_ref[0])

    dW_ref[0, 0:128] = dW_ref[0, 0:128] + dwa2
    dW_ref[0, 128:256] = dW_ref[0, 128:256] + dwb2
    dW_ref[0, 256:384] = dW_ref[0, 256:384] + dw1
    dW_ref[0, 384:512] = dW_ref[0, 384:512] + dw2
    dW_ref[0, 512:515] = dW_ref[0, 512:515] + jnp.concatenate(
        [db0, db1, db2], axis=0
    )


def _run_backward(packed, x0, tx, y0, ty, mlp, g, radius, hf, wf, padx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x0.shape[0]
    hp = packed.shape[-1] // _C
    (
        nbn,
        jn,
        off,
        ylen,
        fe_len,
        fl_len,
        fl_lo_rel,
        fe_top,
        fe_bot,
        fl_top,
        fl_bot,
        row_top,
        row_bot,
    ) = _bwd_geometry(radius, hp, hf)
    span, _ = _window_geometry(radius, ylen)

    # Zero-pad so every program's feature DMA stays in bounds; the padded
    # rows only feed zero-g phantom rows, so their content is irrelevant.
    fe_arr = jnp.pad(packed, ((0, 0), (0, 0), (fe_top * _C, fe_bot * _C)))
    fl_arr = jnp.pad(packed, ((0, 0), (0, 0), (fl_top * _C, fl_bot * _C)))

    pad_rows = ((0, 0), (row_top, row_bot), (0, 0))
    # Pre-windowed row arrays (n, jn, ylen, wf): program (i, jb) reads window
    # jb directly via BlockSpec — the windows overlap (stride 2*nbn < ylen),
    # which block indexing can't express, and a manual wf-wide lane slice
    # isn't tile-alignable. The ~ylen/(2*nbn) duplication is a few MB.
    win_idx = (
        2 * nbn * jnp.arange(jn)[:, None] + jnp.arange(ylen)[None]
    )  # (jn, ylen)

    def windows(arr):
        return jnp.pad(arr, pad_rows)[:, win_idx, :]

    g_win = windows(g.astype(jnp.float32))
    x0_win = windows(x0)
    tx_win = windows(tx)
    y0_win = windows(y0)
    ty_win = windows(ty)

    w_a2, w_b2, b0, w1, b1, w2, b2 = mlp
    dtype = packed.dtype
    wa2t = w_a2.T.astype(dtype)
    wb2t = w_b2.T.astype(dtype)
    w1t = w1.T.astype(dtype)
    w2c = jnp.broadcast_to(w2[:, 0], (1, 128)).astype(jnp.float32)

    kernel = functools.partial(
        _backward_kernel,
        nbn,
        radius,
        off,
        ylen,
        fl_lo_rel,
        hf,
        wf,
        padx,
        span,
    )

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j, s=len(shape): (0,) * s)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    win_spec = pl.BlockSpec((1, 1, ylen, wf), lambda i, j: (i, j, 0, 0))
    dfe, dfl, dW = _rt.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 128, hp * _C), dtype),
            jax.ShapeDtypeStruct((n, 128, hp * _C), dtype),
            jax.ShapeDtypeStruct((n, 520, 128), jnp.float32),
        ),
        grid=(n, jn),
        in_specs=[
            win_spec,  # x0
            win_spec,  # tx
            win_spec,  # y0
            win_spec,  # ty
            win_spec,  # g
            full(w_a2.shape),
            full(w_b2.shape),
            full((1, b0.shape[0])),
            full(w1.shape),
            full((1, b1.shape[0])),
            full(w2.shape),
            full(wa2t.shape),
            full(wb2t.shape),
            full(w1t.shape),
            full(w2c.shape),
            any_spec,  # fe features
            any_spec,  # fl features
            full((1, 1)),
        ],
        out_specs=(
            pl.BlockSpec((1, 128, nbn * _C), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 128, nbn * _C), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 520, 128), lambda i, j: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((128, fe_len * _C), dtype),
            pltpu.VMEM((128, fl_len * _C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        x0_win,
        tx_win,
        y0_win,
        ty_win,
        g_win,
        w_a2,
        w_b2,
        b0[None],
        w1,
        b1[None],
        w2,
        wa2t,
        wb2t,
        w1t,
        w2c,
        fe_arr,
        fl_arr,
        b2.reshape(1, 1),
    )
    return dfe, dfl, dW


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    return _rt.kernels_enabled()


def _unpack_dw(dW_sum, mlp):
    """Split the packed per-frame weight-grad accumulator into cotangents
    matching `_pack_mlp`'s outputs."""
    w_a2, w_b2, b0, w1, b1, w2, b2 = mlp
    d_wa2 = dW_sum[0:128, : w_a2.shape[1]].astype(w_a2.dtype)
    d_wb2 = dW_sum[128:256, : w_b2.shape[1]].astype(w_b2.dtype)
    d_w1 = dW_sum[256:384, : w1.shape[1]].astype(w1.dtype)
    d_w2 = dW_sum[384:512, : w2.shape[1]].astype(w2.dtype)
    d_b0 = dW_sum[512, : b0.shape[0]]
    d_b1 = dW_sum[513, : b1.shape[0]]
    d_b2 = dW_sum[514, 0].reshape(()).astype(jnp.float32)
    return d_wa2, d_wb2, d_b0, d_w1, d_b1, d_w2, d_b2


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3)
)
def _fused_core(radius, hf, wf, padx, packed, x0, tx, y0, ty, mlp):
    return _run_forward(packed, x0, tx, y0, ty, mlp, radius, hf, wf, padx)


def _fused_core_fwd(radius, hf, wf, padx, packed, x0, tx, y0, ty, mlp):
    out = _run_forward(packed, x0, tx, y0, ty, mlp, radius, hf, wf, padx)
    return out, (packed, x0, tx, y0, ty, mlp)


def _fused_core_bwd(radius, hf, wf, padx, residuals, g):
    packed, x0, tx, y0, ty, mlp = residuals
    dfe, dfl, dW = _run_backward(
        packed, x0, tx, y0, ty, mlp, g, radius, hf, wf, padx
    )
    # Frame i's cotangent: earlier-branch grad from pair i + later-branch
    # grad from pair i-1.
    dpacked = jnp.pad(dfe, ((0, 1), (0, 0), (0, 0))) + jnp.pad(
        dfl, ((1, 0), (0, 0), (0, 0))
    )
    dmlp = _unpack_dw(jnp.sum(dW, axis=0), mlp)
    zeros = lambda a: jnp.zeros_like(a)
    return (dpacked, zeros(x0), zeros(tx), zeros(y0), zeros(ty), dmlp)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def corr_weights(
    features_nhwc: Float[Array, "f hn wn c"],
    grid: Float[Array, "p h w 2"],
    mlp_params: list,
    radius: int = 4,
) -> Float[Array, "p h w"]:
    """Correspondence weights from native-res features; grid is frozen.

    Differentiable in `features_nhwc` and `mlp_params` (packing/padding
    transposes ride XLA AD outside the kernels); the grid's cotangent is
    zero by construction (frozen optical flow).
    """
    if not _on_tpu() or radius > _MAX_RADIUS:
        return corr_weights_ref(
            features_nhwc, jax.lax.stop_gradient(grid), mlp_params, radius
        )
    f, hn, wn, c = features_nhwc.shape
    h, w = 2 * hn, 2 * wn
    packed, padx = _pack_features(features_nhwc)
    x0, tx, y0, ty = _grid_params(jax.lax.stop_gradient(grid), h, w)
    mlp = _pack_mlp(mlp_params, packed.dtype)
    return _fused_core(radius, h, w, padx, packed, x0, tx, y0, ty, mlp)
