"""MiDaS v2.1 small (EfficientNet-Lite3 encoder + RefineNet decoder) in JAX.

Architecture-faithful port of the torch.hub `MiDaS_small` model the reference
loads (`flowmap/model/backbone/backbone_midas.py:50-56`):

- Encoder: EfficientNet-Lite3 (width 1.2 / depth 1.4, SE removed, ReLU6,
  stem/head channels fixed — the "lite" modifications), tapped at 4 stages
  with channels (32, 48, 136, 384) at strides (4, 8, 16, 32).
- Scratch: per-stage 3x3 projection convs to (64, 128, 256, 512) (expand=True).
- Decoder: 4 FeatureFusion blocks (two 2-conv residual units each, bilinear
  x2 upsample with align_corners=True, 1x1 squeeze), producing 64-channel
  features at input/2 resolution — exactly the tensor the reference taps for
  its correspondence-weight MLP after splitting off `scratch.output_conv`.
- Head ("output_conv"): 3x3 conv 64->32, x2 upsample, 3x3 conv 32->32, ReLU,
  1x1 conv 32->1, ReLU. The "exp" depth mapping drops the last conv's
  trailing non-negativity (reference: `backbone_midas.py:70-71`). NB the
  head's x2 upsample is align_corners=FALSE (upstream MiDaS `blocks.py`
  `Interpolate` defaults align_corners=False and `midas_net_custom.py`'s
  output_conv does not override it), unlike the FeatureFusion upsamples
  which pass align_corners=True explicitly. That makes the upsample
  parity-periodic, so upsample+conv2 collapse EXACTLY into four 3x3 parity
  convs at half resolution (`_head_up2_conv_proj`) — the full-resolution
  32-channel tensor never exists, which at reference scale saves ~17 ms of
  HBM traffic per optimization step versus the materialized composition.

Layout is NHWC internally (TPU-native conv layout); the public API takes and
returns NCHW to match the rest of the framework. Parameters live in a plain
nested dict whose keys mirror the torch module tree, so the weight converter
(`flowmap_tpu/utils/torch_convert.py`) is a mechanical key/layout mapping.

BatchNorm: batch statistics are used during training from scratch; converted
pretrained checkpoints arrive with BN folded into the preceding conv (the
encoder is frozen-ish at lr 3e-5 and the reference runs it in Lightning train
mode, so folding matches its inference behavior closely).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as _np
from jaxtyping import Array, Float

# ---------------------------------------------------------------------------
# Primitive layers (explicit param dicts, NHWC)
# ---------------------------------------------------------------------------


def _conv_init(key, cin: int, cout: int, k: int, groups: int = 1, bias: bool = True):
    fan_in = cin // groups * k * k
    std = (2.0 / fan_in) ** 0.5
    params = {"kernel": std * jax.random.normal(key, (k, k, cin // groups, cout))}
    if bias:
        params["bias"] = jnp.zeros((cout,))
    return params


def _conv(params, x, stride: int = 1, groups: int = 1, padding="SAME"):
    # NB 1x1 convs as explicit dots were measured ~10 ms/step SLOWER at
    # reference scale (XLA's conv fusions + layouts beat the dot lowering).
    # NB stride-2 depthwise with a parity-shift dx backward (_dw_conv_s2
    # below) measured 120.6 vs 108.2 ms/step at reference scale — a 12 ms
    # REGRESSION despite the replaced fusions sitting at ~3x their
    # bandwidth envelopes (docs/PERF_R5.md): the custom_vjp boundary breaks
    # XLA's kOutput fusion of the surrounding elementwise work and the
    # pad/slice/interleave chain defeats the one-pass output loop. Kept
    # (exact, tested) as a recorded negative result; not routed.
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=(stride, stride),
        padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


def _same_pad_s2(size: int, k: int) -> tuple[int, int]:
    """XLA SAME padding for stride 2 (even `size`): lo = total//2."""
    total = max((size // 2 - 1) * 2 + k - size, 0)
    return total // 2, total - total // 2


@jax.custom_vjp
def _dw_conv_s2(x, kernel):
    """Depthwise conv, stride 2, SAME, even input dims. Forward is the
    plain XLA depthwise conv; dx backward is the parity-shift formulation
    (each input parity field receives a fixed <= ceil(k/2)^2 tap subset of
    the output cotangent at unit shifts — pure fused elementwise work
    instead of XLA's lhs-dilated grouped transposed conv)."""
    k = kernel.shape[0]
    h, w = x.shape[1], x.shape[2]
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(2, 2),
        padding=(_same_pad_s2(h, k), _same_pad_s2(w, k)),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _dw_conv_s2_fwd(x, kernel):
    return _dw_conv_s2(x, kernel), (x, kernel)


def _dw_conv_s2_bwd(residual, dy):
    x, kernel = residual
    k = kernel.shape[0]
    n, h, w, c = x.shape
    oh, ow = h // 2, w // 2
    pl_h, _ = _same_pad_s2(h, k)
    pl_w, _ = _same_pad_s2(w, k)
    wk = kernel[:, :, 0, :]  # (k, k, c)

    # dx[2m+qa, 2j+qb] = sum_{ki,kj valid for (qa,qb)} w[ki,kj] *
    #                    dy[m + s(qa,ki), j + s(qb,kj)]
    # with s = (q + pad_lo - k_idx) / 2 (integral iff parity matches).
    shifts: dict[int, list[tuple[int, int]]] = {0: [], 1: []}
    for q in (0, 1):
        for ki in range(k):
            num = q + pl_h - ki  # same for w with pl_w (k square, pads equal
            if num % 2 == 0:     # only when h,w pads coincide — guarded below)
                shifts[q].append((ki, num // 2))

    def tap_field(s_i, s_j, tap):
        """w[tap] * dy[m + s_i, j + s_j], zero outside the output."""
        pad_i = (max(-s_i, 0), max(s_i, 0))
        pad_j = (max(-s_j, 0), max(s_j, 0))
        dyp = jnp.pad(dy, ((0, 0), pad_i, pad_j, (0, 0)))
        sl_i = slice(max(s_i, 0), max(s_i, 0) + oh)
        sl_j = slice(max(s_j, 0), max(s_j, 0) + ow)
        return dyp[:, sl_i, sl_j, :] * tap

    # Row/col parities may have different pad_lo when h and w pads differ
    # (k=5 on non-square inputs keeps pl identical as long as both dims are
    # even — SAME total depends only on k for stride 2 and even size).
    shifts_w: dict[int, list[tuple[int, int]]] = {0: [], 1: []}
    for q in (0, 1):
        for kj in range(k):
            num = q + pl_w - kj
            if num % 2 == 0:
                shifts_w[q].append((kj, num // 2))

    fields = {}
    for qa in (0, 1):
        for qb in (0, 1):
            acc = None
            for ki, s_i in shifts[qa]:
                for kj, s_j in shifts_w[qb]:
                    t = tap_field(s_i, s_j, wk[ki, kj])
                    acc = t if acc is None else acc + t
            fields[(qa, qb)] = (
                acc
                if acc is not None
                else jnp.zeros((n, oh, ow, c), dy.dtype)
            )

    # Interleave the four parity fields back to (n, h, w, c).
    rows = [
        jnp.stack([fields[(qa, 0)], fields[(qa, 1)]], axis=3).reshape(
            n, oh, w, c
        )
        for qa in (0, 1)
    ]
    dx = jnp.stack(rows, axis=2).reshape(n, h, w, c)

    # Weight grad: keep XLA's transposed reduction (at ~2x envelope it is
    # not the prize; the dx path at 3.4x was).
    _, pull = jax.vjp(
        lambda kern: jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(2, 2),
            padding=(_same_pad_s2(h, k), _same_pad_s2(w, k)),
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        kernel,
    )
    (dkernel,) = pull(dy)
    return dx, dkernel


_dw_conv_s2.defvjp(_dw_conv_s2_fwd, _dw_conv_s2_bwd)


def _bn_init(c: int):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _bn(params, x, eps: float = 1e-3):
    """Batch-statistics normalization (training mode); folded for pretrained.

    Statistics accumulate in f32 (strictly more accurate than reducing in the
    bf16 compute dtype) with the two-pass centered variance: the one-pass
    E[x^2] - m^2 form cancels catastrophically for low-variance channels, and
    the 50-layer net amplifies that seed noise chaotically (measured: >50%
    output divergence at random init). The affine application is pre-folded
    into one scale/bias pair so the normalize step is a single fused
    multiply-add in the compute dtype.
    """
    if params is None:  # BN folded into the conv at weight conversion
        return x
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2), keepdims=True)
    scale = (jax.lax.rsqrt(var + eps) * params["scale"]).astype(x.dtype)
    bias = (params["bias"] - mean * scale).astype(x.dtype)
    return x * scale + bias


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _mbconv_down_min_hw() -> int:
    """Min OUTPUT h*w for the fused stride-2 kernel (A/B knob).

    Default OFF — a recorded NEGATIVE result: the kernel is exact (CPU
    interpret parity 3e-7) and runs standalone on TPU, but measures 16.8 ms
    fwd+bwd vs 12.0 for the XLA formulation at reference scale (the
    VMEM-stack workarounds it needs — per-field passes, halved RMW
    accumulations, a recompute backward — cost more VPU traffic than the
    fused-HBM saving), and inside the full train step it faults the TPU
    worker (unresolved interaction). Opt in for experiments only.
    """
    import os

    return int(os.environ.get("FLOWMAP_MBCONV_DOWN_MIN_HW", str(1 << 30)))


def _interp_matrix(size_out: int, size_in: int, align_corners: bool, dtype):
    """Dense (out, in) bilinear interpolation matrix (2 nonzeros per row)."""
    import numpy as np

    if align_corners:
        src = np.arange(size_out) * ((size_in - 1) / max(size_out - 1, 1))
    else:
        src = np.clip(
            (np.arange(size_out) + 0.5) * (size_in / size_out) - 0.5,
            0,
            size_in - 1,
        )
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, size_in - 1)
    t = src - i0
    m = np.zeros((size_out, size_in), np.float32)
    m[np.arange(size_out), i0] += 1 - t
    m[np.arange(size_out), i1] += t
    return jnp.asarray(m, dtype=dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _upsample2x(x, align_corners: bool = True):
    """Bilinear x2 upsample, align_corners=True (torch Interpolate in MiDaS).

    Applied as two small interp-matrix contractions on the MXU: the
    integer-indexing formulation lowers to a gather whose backward is a
    TPU-hostile scatter-add, and a banded shifted-slice stencil (measured)
    loses to the matmul on layout grounds — XLA assigns the pad/stack chain
    batch-minor layouts and the fusions run far below HBM speed. A matmul's
    transpose is a matmul — but it must be SPELLED as one: the custom VJP
    below applies the transposed interp matrices in the same einsum form as
    the forward, because XLA's automatic transpose of these dots materializes
    a full transpose of the (n, 2h, 2w, c) cotangent (~6 ms/step at
    reference scale on the head upsample alone).
    """
    n, h, w, c = x.shape
    ay = _interp_matrix(2 * h, h, align_corners, x.dtype)
    ax = _interp_matrix(2 * w, w, align_corners, x.dtype)
    x = jnp.einsum("Oh,nhwc->nOwc", ay, x)
    return jnp.einsum("Ow,nhwc->nhOc", ax, x)


def _upsample2x_fwd(x, align_corners):
    return _upsample2x(x, align_corners), x.shape[1:3]


def _upsample2x_bwd(align_corners, hw, g):
    h, w = hw
    ayt = _interp_matrix(2 * h, h, align_corners, g.dtype).T  # (h, 2h)
    axt = _interp_matrix(2 * w, w, align_corners, g.dtype).T  # (w, 2w)
    g = jnp.einsum("Ow,nhwc->nhOc", axt, g)
    return (jnp.einsum("Oh,nhwc->nOwc", ayt, g),)


_upsample2x.defvjp(_upsample2x_fwd, _upsample2x_bwd)


# Parity composition of (3x3 conv) ∘ (x2 bilinear upsample, align_corners=
# False). Output row 2m+p depends on input rows m-1..m+1 through weights
# that mix the upsample taps (0.25/0.75, parity-periodic for scale 2) with
# the conv taps: K_p[dm] = sum_dy B[p, dm, dy] * w[dy]. Rows of B: dm in
# (-1, 0, 1); columns: the conv kernel tap dy in (0, 1, 2).
# NumPy (not jnp) on purpose: a module-level jnp constant initializes the XLA
# backend at import time, which breaks jax.distributed.initialize() in the
# multi-process CLIs (it must run before any backend is created). It is only
# consumed inside traced einsums, where NumPy operands are fine.
_UP2_B = _np.asarray(
    [
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.75], [0.0, 0.0, 0.25]],
        [[0.25, 0.0, 0.0], [0.75, 0.75, 0.25], [0.0, 0.25, 0.75]],
    ],
    _np.float32,
)


def _head_tail(y, b2, w3, b3):
    """(..., cout) pre-bias conv2 output -> (...) projected scalar."""
    y = jax.nn.relu(y + b2.astype(y.dtype))
    return jnp.einsum("...c,c->...", y.astype(w3.dtype), w3) + b3


def _head_strips(zt, zb, zl, zr, conv2, w3, b3, h, w):
    """Exact TWO border rows/columns of the head output on each side.

    zt/zb: (n, 2, w, cin) top/bottom z rows; zl/zr: (n, h, 2, cin)
    left/right z columns. Returns (y_top, y_bot, y_left, y_right), each two
    full-resolution rows (columns): the upsample's border clamp is
    reproduced via the interp matrix / the 0.75-0.25 tap pair, and conv2's
    zero padding applies at the frame edge. Two-wide because the head
    kernel's zero-padded interior is invalid wherever the parity conv
    touches the upsample clamp — output rows 0..1 and 2h-2..2h-1.
    """
    w2c = conv2["kernel"].astype(zt.dtype)
    b2 = conv2["bias"]

    def strip(band, pad_h, pad_w):
        y = jax.lax.conv_general_dilated(
            band, w2c, (1, 1), (pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return _head_tail(y, b2, w3, b3)

    ax = _interp_matrix(2 * w, w, False, zt.dtype)
    ay = _interp_matrix(2 * h, h, False, zt.dtype)
    q1, q3 = jnp.asarray(0.25, zt.dtype), jnp.asarray(0.75, zt.dtype)

    # Upsampled rows 0..2 (top) and 2h-3..2h-1 (bottom) along H.
    band_t = jnp.concatenate(
        [
            zt[:, 0:1],
            q3 * zt[:, 0:1] + q1 * zt[:, 1:2],
            q1 * zt[:, 0:1] + q3 * zt[:, 1:2],
        ],
        axis=1,
    )
    band_t = jnp.einsum("Ow,nrwc->nrOc", ax, band_t)
    y_top = strip(band_t, (1, 0), (1, 1))  # (n, 2, 2w)
    band_b = jnp.concatenate(
        [
            q3 * zb[:, 0:1] + q1 * zb[:, 1:2],
            q1 * zb[:, 0:1] + q3 * zb[:, 1:2],
            zb[:, 1:2],
        ],
        axis=1,
    )
    band_b = jnp.einsum("Ow,nrwc->nrOc", ax, band_b)
    y_bot = strip(band_b, (0, 1), (1, 1))
    band_l = jnp.concatenate(
        [
            zl[:, :, 0:1],
            q3 * zl[:, :, 0:1] + q1 * zl[:, :, 1:2],
            q1 * zl[:, :, 0:1] + q3 * zl[:, :, 1:2],
        ],
        axis=2,
    )
    band_l = jnp.einsum("Oh,nhrc->nOrc", ay, band_l)
    y_left = strip(band_l, (1, 1), (1, 0))  # (n, 2h, 2)
    band_r = jnp.concatenate(
        [
            q3 * zr[:, :, 0:1] + q1 * zr[:, :, 1:2],
            q1 * zr[:, :, 0:1] + q3 * zr[:, :, 1:2],
            zr[:, :, 1:2],
        ],
        axis=2,
    )
    band_r = jnp.einsum("Oh,nhrc->nOrc", ay, band_r)
    y_right = strip(band_r, (1, 1), (0, 1))
    return y_top, y_bot, y_left, y_right


def _head_splice(y_main, strips):
    y_top, y_bot, y_left, y_right = strips
    y = jnp.concatenate([y_top, y_main[:, 2:-2], y_bot], axis=1)
    return jnp.concatenate([y_left, y[:, :, 2:-2], y_right], axis=2)


def _head_parity_kernel(conv2, dtype):
    """Compose upsample(ac=False) with conv2 into the 4-phase 3x3 kernel."""
    w2 = conv2["kernel"].astype(jnp.float32)  # (3, 3, cin, cout)
    cin, cout = w2.shape[2], w2.shape[3]
    k = jnp.einsum("pad,qbe,deio->abipqo", _UP2_B, _UP2_B, w2)
    return k.reshape(3, 3, cin, 4 * cout).astype(dtype)


def _head_up2_conv_proj(z, conv2, w3, b3):
    """relu(conv2(upsample2x_ac_false(z))) @ w3 + b3, without materializing
    the full-resolution conv2 activation.

    z: (n, h, w, cin); conv2: 3x3 params (cin -> cout); w3: (cout,); b3
    scalar. Returns (n, 2h, 2w) — the MiDaS head tail after conv1.

    Interior outputs come from four parity convs at half resolution (one
    conv with 4*cout output channels; replicate padding of z reproduces the
    upsample's border clamp exactly). The four border rows/columns see
    conv2's zero padding instead of a phantom upsample tap, so they are
    recomputed exactly from thin upsampled bands and spliced in AFTER the
    pointwise relu/projection — only (n, 2h, 2w) scalars are ever at full
    resolution.

    Requires h >= 2 and w >= 2 (the border bands index z[:, 1:2] and
    z[:, -2:-1]); real MiDaS inputs are far above that.
    """
    n, h, w, cin = z.shape
    assert h >= 2 and w >= 2, "head parity composition needs h, w >= 2"
    cout = conv2["kernel"].shape[-1]
    b2 = conv2["bias"]

    # Interior: parity-composed kernel, one VALID conv on replicate-padded z.
    k = _head_parity_kernel(conv2, z.dtype)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    phases = jax.lax.conv_general_dilated(
        zp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y_main = _head_tail(phases.reshape(n, h, w, 2, 2, cout), b2, w3, b3)
    y_main = y_main.transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, 2 * w)

    strips = _head_strips(
        z[:, 0:2], z[:, -2:], z[:, :, 0:2], z[:, :, -2:], conv2, w3, b3, h, w
    )
    return _head_splice(y_main, strips)


def _head_fused(features_nchw, path1, head_params, w3, b3):
    """Kernel-path head: fused interior (ops/pallas/head_kernel.py) + the
    exact XLA border strips computed from thin conv1 bands."""
    from ...ops.pallas.head_kernel import head_interior

    conv1, conv2 = head_params["conv1"], head_params["conv2"]
    n, h, w, _ = path1.shape
    kp = _head_parity_kernel(conv2, jnp.float32)
    y4 = head_interior(
        features_nchw,
        conv1["kernel"],
        conv1["bias"],
        kp,
        conv2["bias"],
        w3,
        b3,
    )
    y_main = (
        y4.reshape(n, 2, 2, h, w)
        .transpose(0, 3, 1, 4, 2)
        .reshape(n, 2 * h, 2 * w)
    )

    def band(x, pad_h, pad_w):
        y = jax.lax.conv_general_dilated(
            x, conv1["kernel"].astype(x.dtype), (1, 1), (pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + conv1["bias"]

    zt = band(path1[:, 0:3], (1, 0), (1, 1))
    zb = band(path1[:, -3:], (0, 1), (1, 1))
    zl = band(path1[:, :, 0:3], (1, 1), (1, 0))
    zr = band(path1[:, :, -3:], (1, 1), (0, 1))
    strips = _head_strips(zt, zb, zl, zr, conv2, w3, b3, h, w)
    return _head_splice(y_main, strips)


# ---------------------------------------------------------------------------
# EfficientNet-Lite3 encoder
# ---------------------------------------------------------------------------

# (expand_ratio, channels, repeats, stride, kernel) per stage — lite3 scaling
# of the EfficientNet-B0 recipe (width 1.2, depth 1.4, fixed first/last
# repeats, no squeeze-excite).
_LITE3_STAGES = [
    (1, 24, 1, 1, 3),
    (6, 32, 3, 2, 3),
    (6, 48, 3, 2, 5),
    (6, 96, 5, 2, 3),
    (6, 136, 5, 1, 5),
    (6, 232, 6, 2, 5),
    (6, 384, 1, 1, 3),
]
_STEM_CHANNELS = 32


def _mbconv_init(key, cin, cout, expand, kernel, fold_bn=False):
    keys = jax.random.split(key, 3)
    mid = cin * expand
    p = {}
    if expand != 1:
        p["expand_conv"] = _conv_init(keys[0], cin, mid, 1, bias=fold_bn)
        p["expand_bn"] = None if fold_bn else _bn_init(mid)
    p["dw_conv"] = _conv_init(keys[1], mid, mid, kernel, groups=mid, bias=fold_bn)
    p["dw_bn"] = None if fold_bn else _bn_init(mid)
    p["project_conv"] = _conv_init(keys[2], mid, cout, 1, bias=fold_bn)
    p["project_bn"] = None if fold_bn else _bn_init(cout)
    return p


def _mbconv(p, x, cin, cout, expand, stride, kernel):
    mid_groups = cin * expand
    if (
        stride == 2
        and expand != 1
        and p.get("dw_bn") is None  # folded BN (pretrained path)
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
        and x.shape[2] // 2 <= 126
        and (x.shape[1] // 2) * (x.shape[2] // 2) >= _mbconv_down_min_hw()
    ):
        from ...ops.pallas import runtime as _prt

        # bf16-only on real TPU (the f32 backward working set exceeds VMEM;
        # interpret mode is the exact-parity CI path).
        if _prt.kernels_enabled() and (
            _prt.interpret_mode() or x.dtype == jnp.bfloat16
        ):
            from ...ops.pallas.mbconv_down import mbconv_down

            return mbconv_down(x, p, cin, mid_groups, cout, kernel)
    shortcut = x
    if expand != 1:
        x = _relu6(_bn(p["expand_bn"], _conv(p["expand_conv"], x)))
    x = _relu6(
        _bn(p["dw_bn"], _conv(p["dw_conv"], x, stride=stride, groups=mid_groups))
    )
    x = _bn(p["project_bn"], _conv(p["project_conv"], x))
    if stride == 1 and cin == cout:
        x = x + shortcut
    return x


def _encoder_init(key, fold_bn=False):
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    p = {
        "stem_conv": _conv_init(keys[next(ki)], 3, _STEM_CHANNELS, 3, bias=fold_bn),
        "stem_bn": None if fold_bn else _bn_init(_STEM_CHANNELS),
        "blocks": [],
    }
    cin = _STEM_CHANNELS
    for expand, cout, repeats, stride, kernel in _LITE3_STAGES:
        for r in range(repeats):
            p["blocks"].append(
                _mbconv_init(
                    keys[next(ki)], cin, cout, expand, kernel, fold_bn=fold_bn
                )
            )
            cin = cout
    return p


def _encoder(p, x):
    """Run the encoder; returns the 4 tapped feature maps (NHWC).

    On the folded-BN (pretrained) path with Pallas kernels enabled, runs of
    consecutive stride-1 MBConv blocks execute as fused VMEM-resident chains
    (`ops/pallas/mbconv.py`) — a whole stage pair becomes one kernel instead
    of ~27 XLA convolutions. Stride-2 blocks, the stem, and the
    batch-statistics BN path keep the XLA formulation (batch stats couple
    frames across the chain's per-frame grid).
    """
    from ...ops.pallas import runtime as _prt
    from ...ops.pallas.mbconv import MBConvSpec, mbconv_chain

    x = _relu6(_bn(p["stem_bn"], _conv(p["stem_conv"], x, stride=2)))
    folded = p["stem_bn"] is None and _prt.kernels_enabled()
    taps = {}
    idx = 0
    cin = _STEM_CHANNELS
    pending: list = []  # [(MBConvSpec, params)] eligible consecutive blocks

    # Minimum spatial size (h*w) for the fused kernel path; below it the
    # XLA formulation runs. Measured at reference scale (150x160x224, v5e):
    # the fused kernels are a wash at 40x56 and LOSE ~12 ms/step at the /16
    # and /32 stages — there HBM is cheap and XLA's materialize-everything
    # backward beats the kernel's in-VMEM recompute (3 extra stencil passes).
    # Default is therefore off; probes/tests opt in via the env knob.
    import os

    min_hw = int(os.environ.get("FLOWMAP_MBCONV_MIN_HW", str(1 << 30)))

    def flush(x):
        if not pending:
            return x
        if x.shape[1] * x.shape[2] >= min_hw:
            specs = tuple(s for s, _ in pending)
            params = tuple(
                {k: q[k] for k in ("expand_conv", "dw_conv", "project_conv")}
                for _, q in pending
            )
            x = mbconv_chain(x, specs, params)
        else:
            for s, q in pending:
                x = _mbconv(
                    q, x, s.cin, s.cout, s.cmid // s.cin, 1, s.kernel
                )
        pending.clear()
        return x

    for s, (expand, cout, repeats, stride, kernel) in enumerate(_LITE3_STAGES):
        for r in range(repeats):
            st = stride if r == 0 else 1
            blk = p["blocks"][idx]
            if folded and st == 1 and expand != 1:
                pending.append(
                    (
                        MBConvSpec(cin, cin * expand, cout, kernel, cin == cout),
                        blk,
                    )
                )
            else:
                x = flush(x)
                x = _mbconv(blk, x, cin, cout, expand, st, kernel)
            cin = cout
            idx += 1
        if s in (1, 2, 4, 6):
            x = flush(x)
        taps[s] = x
    # MiDaS taps: layer1 = after stage 1 (/4, 32ch), layer2 = stage 2 (/8,
    # 48ch), layer3 = stage 4 (/16, 136ch), layer4 = stage 6 (/32, 384ch).
    return taps[1], taps[2], taps[4], taps[6]


# ---------------------------------------------------------------------------
# Decoder (scratch + refinenets + head)
# ---------------------------------------------------------------------------

_TAP_CHANNELS = (32, 48, 136, 384)
_RN_CHANNELS = (64, 128, 256, 512)  # expand=True scratch widths


def _rcu_init(key, c):
    k1, k2 = jax.random.split(key)
    return {"conv1": _conv_init(k1, c, c, 3), "conv2": _conv_init(k2, c, c, 3)}


def _rcu(p, x):
    y = _conv(p["conv1"], jax.nn.relu(x))
    y = _conv(p["conv2"], jax.nn.relu(y))
    return x + y


def _fusion_init(key, c, c_out):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "rcu1": _rcu_init(k1, c),
        "rcu2": _rcu_init(k2, c),
        "out_conv": _conv_init(k3, c, c_out, 1),
    }


def _fusion(p, x, skip=None):
    if skip is not None:
        x = x + _rcu(p["rcu1"], skip)
    x = _rcu(p["rcu2"], x)
    # The reference applies the 1x1 squeeze AFTER the x2 upsample
    # (FeatureFusionBlock.forward); a 1x1 conv commutes exactly with the
    # convex align_corners=True bilinear weights (sum to 1, so the bias
    # passes through too), and running it at half resolution does the conv
    # on 4x fewer pixels and upsamples c_out <= c channels.
    x = _conv(p["out_conv"], x)
    return _upsample2x(x, align_corners=True)


def midas_small_init(key, fold_bn: bool = False) -> dict:
    keys = jax.random.split(key, 12)
    params = {
        "encoder": _encoder_init(keys[0], fold_bn=fold_bn),
        "scratch": {
            f"layer{i + 1}_rn": _conv_init(
                keys[1 + i], _TAP_CHANNELS[i], _RN_CHANNELS[i], 3, bias=False
            )
            for i in range(4)
        },
        "refinenet4": _fusion_init(keys[5], 512, 256),
        "refinenet3": _fusion_init(keys[6], 256, 128),
        "refinenet2": _fusion_init(keys[7], 128, 64),
        "refinenet1": _fusion_init(keys[8], 64, 64),
        "head": {
            "conv1": _conv_init(keys[9], 64, 32, 3),
            "conv2": _conv_init(keys[10], 32, 32, 3),
            "conv3": _conv_init(keys[11], 32, 1, 1),
        },
    }
    return params


class MidasSmall:
    """Namespace for the functional MiDaS-small forward pass."""

    @staticmethod
    def apply_split(
        params: dict,
        images_nchw: Float[Array, "n 3 h w"],
        mapping: Literal["original", "exp"] = "original",
    ) -> tuple[Float[Array, "n h w"], Float[Array, "n c h2 w2"]]:
        """Returns (head output (n, h, w), penultimate features NCHW at /2).

        Mirrors the reference's split of `scratch.output_conv` off the hub
        model (`backbone_midas.py:57-58`): features feed the correspondence
        MLP; the head output feeds the depth mapping.
        """
        x = jnp.transpose(images_nchw, (0, 2, 3, 1))  # NHWC
        l1, l2, l3, l4 = _encoder(params["encoder"], x)
        s = params["scratch"]
        l1 = _conv(s["layer1_rn"], l1)
        l2 = _conv(s["layer2_rn"], l2)
        l3 = _conv(s["layer3_rn"], l3)
        l4 = _conv(s["layer4_rn"], l4)
        path4 = _fusion(params["refinenet4"], l4)
        path3 = _fusion(params["refinenet3"], path4, l3)
        path2 = _fusion(params["refinenet2"], path3, l2)
        path1 = _fusion(params["refinenet1"], path2, l1)  # (n, h/2, w/2, 64)

        h = params["head"]
        w3 = h["conv3"]["kernel"][0, 0, :, 0]
        b3 = h["conv3"]["bias"][0]
        features = jnp.transpose(path1, (0, 3, 1, 2))  # NCHW

        from ...ops.pallas import runtime as _prt

        hh, ww = path1.shape[1], path1.shape[2]
        # f32 on real TPU falls back to XLA: the backward's f32 working set
        # exceeds VMEM (bf16 fits; interpret mode has no limit and is the
        # exact-parity CI path).
        import os

        if (
            _prt.kernels_enabled()
            and (_prt.interpret_mode() or path1.dtype == jnp.bfloat16)
            and path1.shape[3] == 64
            and 3 <= ww <= 126
            and hh >= 3
            # A/B escape hatch (perf probes): force the XLA parity head.
            and os.environ.get("FLOWMAP_HEAD") != "xla"
        ):
            y = _head_fused(features, path1, h, w3, b3)
        else:
            z = _conv(h["conv1"], path1)
            y = _head_up2_conv_proj(z, h["conv2"], w3, b3)
        if mapping == "original":
            # Final non-negativity ReLU (dropped for the "exp" mapping,
            # reference backbone_midas.py:70-71).
            y = jax.nn.relu(y)

        return y, features
