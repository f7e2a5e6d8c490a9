"""Fused Pallas TPU kernels for the packed tracking loss.

The XLA formulation (`loss/loss.py:_track_loss_packed_fused` +
`ops/surface.py:sample_track_points_packed`) is already matmul-shaped, but at
reference scale it materializes two giant intermediates in HBM:

- separable one-hot sampling: (s, l, p, h, 3) f32 ~ 2.9 GB per direction,
- all-pairs projection: several (s, l, l, p) f32 ~ 247 MB tensors.

Together ~26 ms/step of pure HBM traffic for ~0.4 GFLOP of real work. These
kernels keep every intermediate in VMEM:

Kernel A (sampling): one program per (segment, frame-in-window) pair, ordered
by video frame. Builds the arithmetic one-hot bilinear weight matrix for the
pair's track points on the VPU (`hit(clip(floor(x)) - iota)` — exactly
`ops/grid_sample.bilinear_onehot_weights` border semantics) and samples the
frame's surface with a single MXU dot: (3h, W) x (W, P). The backward runs
the transposed dot per pair and accumulates d_surface in the output block —
frame-sorted program order means each frame's block is revisited only
consecutively, which is the Pallas-legal reduction pattern.

Kernel B (all-pairs loss): one program per (segment, source frame). The
per-pair 3x4 projection matrices M[s, fs, ft] = K_ft @ (E_ft^-1 E_fs)[:3]
(folded OUTSIDE in XLA, so pose/intrinsics gradients chain automatically
through d_M) are broadcast as scalars over (target-frame, point) planes:
project, perspective-divide with nan_to_num semantics, huber, mask, reduce —
all in registers. The custom VJP recomputes the forward (it is tiny) and
emits d_xyz and d_M analytically.

Reference semantics: `flowmap/loss/loss_tracking.py:28-61` +
`flowmap/model/projection.py:255-298`. Parity is enforced against the XLA
formulation in interpret mode (tests/test_track_loss_kernel.py).
"""

from __future__ import annotations

import functools

import jax
from . import runtime as _rt
import jax.numpy as jnp
from jaxtyping import Array, Float

_EPS = 1e-5
_INF = 1e8
_NORM_EPS = 1e-24


def _hit(d):
    """max(0, 1 - |d|): exact one-hot for integer-valued f32 deltas."""
    return jnp.maximum(1.0 - jnp.abs(d), 0.0)


def _onehot_pair(coord, size, iota):
    """Border-clamped bilinear one-hot weights along one axis.

    coord: pixel coordinates broadcastable against iota; returns weights with
    the same shape as iota's broadcast — semantics of
    `grid_sample.bilinear_onehot_weights(..., "border")`.
    """
    c0 = jnp.floor(coord)
    t = coord - c0
    c0c = jnp.clip(c0, 0.0, size - 1.0)
    c1c = jnp.clip(c0 + 1.0, 0.0, size - 1.0)
    return (1.0 - t) * _hit(c0c - iota) + t * _hit(c1c - iota)


# ---------------------------------------------------------------------------
# Kernel A: surface sampling at track points
# ---------------------------------------------------------------------------


def _sample_fwd_kernel(h, w, rpc, sfr_ref, s_ref, xy_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    wp = s_ref.shape[-1]
    p = out_ref.shape[-1]
    px = xy_ref[0, 0:1, :]  # (1, P) pixel x
    py = xy_ref[0, 1:2, :]

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wp, p), 0).astype(jnp.float32)
    wxt = _onehot_pair(px, w, iota_x).astype(s_ref.dtype)  # (Wp, P)
    rows = jax.lax.dot_general(
        s_ref[0],
        wxt,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3*rpc, P) f32

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (rpc, p), 0).astype(jnp.float32)
    wyt = _onehot_pair(py, h, iota_y)  # (rpc, P) f32
    parts = [
        jnp.sum(wyt * rows[c * rpc : (c + 1) * rpc, :], axis=0, keepdims=True)
        for c in range(3)
    ]
    parts.append(jnp.zeros((out_ref.shape[-2] - 3, p), jnp.float32))
    out_ref[0] = jnp.concatenate(parts, axis=0)


def _sample_bwd_kernel(h, w, rpc, sfr_ref, xy_ref, dxyz_ref, ds_ref):
    from jax.experimental import pallas as pl

    wp = ds_ref.shape[-1]
    p = dxyz_ref.shape[-1]
    i = pl.program_id(0)

    py = xy_ref[0, 1:2, :]  # (1, P)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (rpc, p), 0).astype(jnp.float32)
    wyt = _onehot_pair(py, h, iota_y)  # (rpc, P)
    d_rows = jnp.concatenate(
        [wyt * dxyz_ref[0, c : c + 1, :] for c in range(3)], axis=0
    )  # (3*rpc, P) f32

    # (1, P) -> (P, 1): a tiny in-kernel relayout beats materializing a
    # whole transposed copy of the xy planes in HBM.
    px_col = jnp.transpose(xy_ref[0, 0:1, :], (1, 0))
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (p, wp), 1).astype(jnp.float32)
    wx = _onehot_pair(px_col, w, iota_x).astype(ds_ref.dtype)  # (P, Wp)
    contribution = jax.lax.dot_general(
        d_rows.astype(ds_ref.dtype),
        wx,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3*rpc, Wp)

    prev = jnp.maximum(i - 1, 0)
    first = jnp.logical_or(i == 0, sfr_ref[i] != sfr_ref[prev])

    @pl.when(first)
    def _():
        ds_ref[0] = contribution

    @pl.when(jnp.logical_not(first))
    def _():
        ds_ref[0] = ds_ref[0] + contribution


# ---------------------------------------------------------------------------
# Kernel B: all-pairs projection + huber + mask + partial sums
# ---------------------------------------------------------------------------


def _project(m, xyz):
    """(48, 16) matrices x (8, P) points -> u, v, q planes of shape (Lp, P)."""
    x = xyz[0:1, :]
    y = xyz[1:2, :]
    z = xyz[2:3, :]
    col = lambda j: m[:, j : j + 1]  # noqa: E731 — (Lp, 1) scalar columns
    u_ = col(0) * x + col(1) * y + col(2) * z + col(3)
    v_ = col(4) * x + col(5) * y + col(6) * z + col(7)
    z_ = col(8) * x + col(9) * y + col(10) * z + col(11)
    den = z_ + _EPS
    qu = u_ / den
    qv = v_ / den
    # nan_to_num(posinf=1e8, neginf=-1e8) semantics.
    u = jnp.where(jnp.isnan(qu), 0.0, jnp.clip(qu, -_INF, _INF))
    v = jnp.where(jnp.isnan(qv), 0.0, jnp.clip(qv, -_INF, _INF))
    return u, v, qu, qv, den


def _loss_terms(l_pad, sx, sy, delta, m, xyz, gt, vis, vsrc):
    u, v, qu, qv, den = _project(m, xyz)
    gt_u = gt[0]
    gt_v = gt[1]
    du = (u - gt_u) * sx
    dv = (v - gt_v) * sy
    norm = jnp.sqrt(du * du + dv * dv + _NORM_EPS)
    mapped = (
        jnp.where(norm < delta, 0.5 * norm * norm, delta * (norm - 0.5 * delta))
        / delta
    )
    target_in = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
    mask = vis * vsrc * target_in.astype(jnp.float32)
    return u, v, qu, qv, den, du, dv, norm, mapped, mask


def _pair_loss_fwd_kernel(
    l_pad, sx, sy, delta, inv_ref, xyz_ref, m_ref, gt_ref, vis_ref, vsrc_ref,
    out_ref,
):
    xyz = xyz_ref[0]
    m = m_ref[0, 0]
    *_, mapped, mask = _loss_terms(
        l_pad, sx, sy, delta, m, xyz, gt_ref[0], vis_ref[0], vsrc_ref[0, 0:1, :]
    )
    loss = jnp.sum(mapped * mask)
    valid = jnp.sum(mask)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    vec = jnp.where(lanes == 0, loss, 0.0) + jnp.where(lanes == 1, valid, 0.0)
    out_ref[0, 0] = jnp.broadcast_to(vec, out_ref.shape[2:])


def _pair_loss_bwd_kernel(
    l_pad,
    sx,
    sy,
    delta,
    inv_ref,
    xyz_ref,
    m_ref,
    gt_ref,
    vis_ref,
    vsrc_ref,
    dxyz_ref,
    dm_ref,
):
    xyz = xyz_ref[0]
    m = m_ref[0, 0]
    u, v, qu, qv, den, du, dv, norm, mapped, mask = _loss_terms(
        l_pad, sx, sy, delta, m, xyz, gt_ref[0], vis_ref[0], vsrc_ref[0, 0:1, :]
    )
    # d(loss)/d(norm), upstream cotangent folded in by the caller.
    dnorm = mask * jnp.where(norm < delta, norm, delta) / delta
    scale = dnorm / norm
    d_u = scale * du * sx
    d_v = scale * dv * sy
    # nan_to_num passes gradient only where the quotient was finite.
    gate_u = (qu - qu == 0.0).astype(jnp.float32)
    gate_v = (qv - qv == 0.0).astype(jnp.float32)
    d_qu = d_u * gate_u
    d_qv = d_v * gate_v
    d_u_ = d_qu / den
    d_v_ = d_qv / den
    d_z_ = -(qu * d_qu + qv * d_qv) / den

    col = lambda j: m[:, j : j + 1]  # noqa: E731
    d_x = jnp.sum(
        col(0) * d_u_ + col(4) * d_v_ + col(8) * d_z_, axis=0, keepdims=True
    )
    d_y = jnp.sum(
        col(1) * d_u_ + col(5) * d_v_ + col(9) * d_z_, axis=0, keepdims=True
    )
    d_z = jnp.sum(
        col(2) * d_u_ + col(6) * d_v_ + col(10) * d_z_, axis=0, keepdims=True
    )
    p = d_x.shape[-1]
    dxyz_ref[0] = jnp.concatenate(
        [d_x, d_y, d_z, jnp.zeros((dxyz_ref.shape[-2] - 3, p), jnp.float32)],
        axis=0,
    )

    x = xyz[0:1, :]
    y = xyz[1:2, :]
    z = xyz[2:3, :]
    cols = []
    for d_row in (d_u_, d_v_, d_z_):
        for operand in (x, y, z, None):
            term = d_row if operand is None else d_row * operand
            cols.append(jnp.sum(term, axis=1, keepdims=True))  # (Lp, 1)
    cols.append(jnp.zeros((l_pad, dm_ref.shape[-1] - 12), jnp.float32))
    dm_ref[0, 0] = jnp.concatenate(cols, axis=1)


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------


def _pad_to(n: int, m: int) -> int:
    return n + (-n) % m


def _on_tpu() -> bool:
    return _rt.kernels_enabled()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _track_loss_core(static, s_arr, m_pad, aux):
    """static = (f, h, w, l, p, sx, sy, delta); diff args: s_arr, m_pad."""
    return _core_fwd(static, s_arr, m_pad, aux)[0]


def _run_sample_fwd(static, s_arr, aux):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, h, w, l, p, sx, sy, delta = static
    rpc = _pad_to(h, 8)
    wp = s_arr.shape[-1]
    pp = aux["xy"].shape[-1]
    n_pairs = aux["xy"].shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # sorted frame index per pair
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((1, 3 * rpc, wp), lambda i, sfr: (sfr[i], 0, 0)),
            pl.BlockSpec((1, 8, pp), lambda i, sfr: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, pp), lambda i, sfr: (i, 0, 0)),
    )
    kernel = functools.partial(_sample_fwd_kernel, h, w, rpc)
    return _rt.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pairs, 8, pp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(aux["sorted_frames"], s_arr, aux["xy"])


def _run_sample_bwd(static, s_dtype, d_xyz, aux):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, h, w, l, p, sx, sy, delta = static
    rpc = _pad_to(h, 8)
    wp = _pad_to(w, 128)
    pp = aux["xy"].shape[-1]
    n_pairs = aux["xy"].shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((1, 8, pp), lambda i, sfr: (i, 0, 0)),
            pl.BlockSpec((1, 8, pp), lambda i, sfr: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3 * rpc, wp), lambda i, sfr: (sfr[i], 0, 0)),
    )
    kernel = functools.partial(_sample_bwd_kernel, h, w, rpc)
    d_s = _rt.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, 3 * rpc, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(aux["sorted_frames"], aux["xy"], d_xyz)
    # Frames never touched by a segment keep uninitialized memory — zero them.
    d_s = jnp.where(aux["covered"][:, None, None], d_s, 0.0)
    return d_s.astype(s_dtype)


def _run_pair_loss_fwd(static, xyz, m_pad, aux):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, h, w, l, p, sx, sy, delta = static
    s = m_pad.shape[0]
    l_pad = m_pad.shape[2]
    pp = aux["xy"].shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # inv_order: pair -> sorted position
        grid=(s, l),
        in_specs=[
            pl.BlockSpec((1, 8, pp), lambda i, j, inv: (inv[i * l + j], 0, 0)),
            pl.BlockSpec((1, 1, l_pad, 16), lambda i, j, inv: (i, j, 0, 0)),
            pl.BlockSpec((1, 2, l_pad, pp), lambda i, j, inv: (i, 0, 0, 0)),
            pl.BlockSpec((1, l_pad, pp), lambda i, j, inv: (i, 0, 0)),
            pl.BlockSpec((1, 8, pp), lambda i, j, inv: (inv[i * l + j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j, inv: (i, j, 0, 0)),
    )
    kernel = functools.partial(_pair_loss_fwd_kernel, l_pad, sx, sy, delta)
    out = _rt.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, l, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(aux["inv_order"], xyz, m_pad, aux["gt"], aux["vis"], aux["vsrc"])
    return jnp.sum(out[:, :, 0, 0]), jnp.sum(out[:, :, 0, 1])


def _run_pair_loss_bwd(static, xyz, m_pad, aux):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, h, w, l, p, sx, sy, delta = static
    s = m_pad.shape[0]
    l_pad = m_pad.shape[2]
    pp = aux["xy"].shape[-1]
    n_pairs = aux["xy"].shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, l),
        in_specs=[
            pl.BlockSpec((1, 8, pp), lambda i, j, inv: (inv[i * l + j], 0, 0)),
            pl.BlockSpec((1, 1, l_pad, 16), lambda i, j, inv: (i, j, 0, 0)),
            pl.BlockSpec((1, 2, l_pad, pp), lambda i, j, inv: (i, 0, 0, 0)),
            pl.BlockSpec((1, l_pad, pp), lambda i, j, inv: (i, 0, 0)),
            pl.BlockSpec((1, 8, pp), lambda i, j, inv: (inv[i * l + j], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, pp), lambda i, j, inv: (inv[i * l + j], 0, 0)),
            pl.BlockSpec((1, 1, l_pad, 16), lambda i, j, inv: (i, j, 0, 0)),
        ],
    )
    kernel = functools.partial(_pair_loss_bwd_kernel, l_pad, sx, sy, delta)
    d_xyz, d_m = _rt.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pairs, 8, pp), jnp.float32),
            jax.ShapeDtypeStruct((s, l, l_pad, 16), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(aux["inv_order"], xyz, m_pad, aux["gt"], aux["vis"], aux["vsrc"])
    return d_xyz, d_m


def _core_fwd(static, s_arr, m_pad, aux):
    xyz = _run_sample_fwd(static, s_arr, aux)
    loss_sum, valid_sum = _run_pair_loss_fwd(static, xyz, m_pad, aux)
    token = jnp.zeros((0,), s_arr.dtype)
    residuals = (xyz, m_pad, aux, token)
    return (loss_sum, valid_sum), residuals


def _core_bwd(static, residuals, g):
    xyz, m_pad, aux, token = residuals
    s_dtype = token.dtype
    g_loss, _ = g  # valid count carries no gradient (masks are boolean).
    d_xyz, d_m = _run_pair_loss_bwd(static, xyz, m_pad, aux)
    d_xyz = d_xyz * g_loss
    d_m = d_m * g_loss
    d_s = _run_sample_bwd(static, s_dtype, d_xyz, aux)

    def zero_ct(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        import numpy as np

        return np.zeros(x.shape, jax.dtypes.float0)

    return d_s, d_m, jax.tree_util.tree_map(zero_ct, aux)


_track_loss_core.defvjp(_core_fwd, _core_bwd)


def track_loss_pallas(
    surfaces: Float[Array, "b f h w 3"],
    extrinsics: Float[Array, "b f 4 4"],
    intrinsics: Float[Array, "b f 3 3"],
    packed,
    image_shape: tuple[int, int],
    delta: float,
) -> tuple[Float[Array, ""], Float[Array, ""]]:
    """Fused packed tracking loss: returns (loss_sum, valid_sum).

    Numerically equivalent to `loss/loss.py:_track_loss_packed_fused` (up to
    float reassociation and f32 projection matrices). Huber mapping only.
    """
    from ..geometry import rigid_inverse

    b, f, h, w, _ = surfaces.shape
    _, s, l, p, _ = packed.xy.shape
    assert b == 1, "packed track loss kernel supports batch size 1"
    h_, w_ = image_shape
    assert (h_, w_) == (h, w)

    scale = (h * w) ** 0.5
    sx = w / scale
    sy = h / scale
    static = (f, h, w, l, p, float(sx), float(sy), float(delta))

    rpc = _pad_to(h, 8)
    wp = _pad_to(w, 128)
    pp = _pad_to(p, 128)
    l_pad = _pad_to(l, 8)

    # --- surfaces arranged (f, 3*rpc, wp), channel-major rows ---
    s_arr = jnp.transpose(surfaces[0], (0, 3, 1, 2))  # (f, 3, h, w)
    s_arr = jnp.pad(s_arr, ((0, 0), (0, 0), (0, rpc - h), (0, wp - w)))
    s_arr = s_arr.reshape(f, 3 * rpc, wp)

    # --- projection matrices (s, l, l_pad, 16) f32 ---
    frame_idx = packed.starts[:, None] + jnp.arange(l)  # (s, l)
    seg_e = extrinsics[0][frame_idx].astype(jnp.float32)  # (s, l, 4, 4)
    seg_k = intrinsics[0][frame_idx].astype(jnp.float32)  # (s, l, 3, 3)
    relative = jnp.einsum("stij,sfjk->sftik", rigid_inverse(seg_e), seg_e)
    m = jnp.einsum("stij,sftjk->sftik", seg_k, relative[..., :3, :])
    m_flat = m.reshape(s, l, l, 12)
    m_pad = jnp.pad(m_flat, ((0, 0), (0, 0), (0, l_pad - l), (0, 4)))

    # --- pair-level planes, frame-sorted ---
    frame_flat = frame_idx.reshape(s * l)
    order = jnp.argsort(frame_flat)
    sorted_frames = frame_flat[order].astype(jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    covered = jnp.zeros((f,), jnp.bool_).at[frame_flat].set(True)

    xy_pix = jnp.stack(
        [
            packed.xy[0, ..., 0] * w - 0.5,
            packed.xy[0, ..., 1] * h - 0.5,
        ],
        axis=-2,
    )  # (s, l, 2, p)
    xy_pix = xy_pix.reshape(s * l, 2, p)[order].astype(jnp.float32)
    xy_plane = jnp.pad(xy_pix, ((0, 0), (0, 6), (0, pp - p)))  # (n, 8, pp)

    vis = packed.visibility[0].astype(jnp.float32)  # (s, l, p)
    src_xy = packed.xy[0]
    src_in = (
        jnp.all(src_xy >= 0, -1) & jnp.all(src_xy < 1, -1)
    ).astype(jnp.float32)
    vsrc = (vis * src_in).reshape(s * l, 1, p)[order]
    vsrc = jnp.pad(vsrc, ((0, 0), (0, 7), (0, pp - p)))  # (n, 8, pp)

    gt = jnp.transpose(packed.xy[0], (0, 3, 1, 2)).astype(jnp.float32)
    gt = jnp.pad(gt, ((0, 0), (0, 0), (0, l_pad - l), (0, pp - p)))
    vis_pad = jnp.pad(vis, ((0, 0), (0, l_pad - l), (0, pp - p)))

    aux = {
        "xy": jax.lax.stop_gradient(xy_plane),
        "gt": jax.lax.stop_gradient(gt),
        "vis": jax.lax.stop_gradient(vis_pad),
        "vsrc": jax.lax.stop_gradient(vsrc),
        "sorted_frames": sorted_frames,
        "inv_order": inv_order,
        "covered": covered,
    }
    return _track_loss_core(static, s_arr, m_pad, aux)
