"""Fused Pallas TPU kernel for the dense flow-reprojection loss.

One direction of the flow loss reprojects every source-frame surface point
through the pair's relative camera into the neighbor frame and penalizes the
deviation of the induced flow from observed flow
(`flowmap/loss/loss_flow.py:31-70` + `flowmap/model/projection.py:143-184`).
Per adjacent pair the math is: fold K_target @ (E_target^-1 E_source)[:3]
into one 3x4 matrix M (done OUTSIDE in XLA so pose/intrinsics gradients
chain through d_M), then per pixel

    (u, v) = perspective(M [X; 1]),  delta = (u - (xy + flow)) * aspect,
    loss += huber(delta) * mask.

XLA's autodiff of this chain materializes several (p, h, w) f32 tensors per
direction (divides, huber pieces, reductions) — ~10 ms/step of HBM traffic
at reference scale for ~1 GFLOP. This kernel runs the whole chain (and its
analytic VJP: d_surfaces, d_M) in VMEM, one program per (pair, row block).

The valid-count normalizer is just sum(mask) — no parameters — and stays in
XLA. Parity vs the XLA formulation (values and gradients) is enforced in
interpret mode (tests/test_flow_loss_kernel.py).
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


def _project_planes(m_ref, x, y, z):
    """Fold-projected u, v planes plus the raw quotients and denominator."""
    col = lambda j: m_ref[0, 0:1, j : j + 1]  # noqa: E731 — (1, 1) scalars
    u_ = col(0) * x + col(1) * y + col(2) * z + col(3)
    v_ = col(4) * x + col(5) * y + col(6) * z + col(7)
    z_ = col(8) * x + col(9) * y + col(10) * z + col(11)
    den = z_ + _EPS
    qu = u_ / den
    qv = v_ / den
    u = jnp.where(jnp.isnan(qu), 0.0, jnp.clip(qu, -_INF, _INF))
    v = jnp.where(jnp.isnan(qv), 0.0, jnp.clip(qv, -_INF, _INF))
    return u, v, qu, qv, den


def _terms(sx, sy, delta, m_ref, xyz_ref, gt_ref, mask_ref):
    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]
    u, v, qu, qv, den = _project_planes(m_ref, x, y, z)
    du = (u - gt_ref[0, 0]) * sx
    dv = (v - gt_ref[0, 1]) * sy
    norm = jnp.sqrt(du * du + dv * dv + _NORM_EPS)
    mapped = (
        jnp.where(norm < delta, 0.5 * norm * norm, delta * (norm - 0.5 * delta))
        / delta
    )
    return x, y, z, u, v, qu, qv, den, du, dv, norm, mapped, mask_ref[0]


def _fwd_kernel(sx, sy, delta, xyz_ref, m_ref, gt_ref, mask_ref, out_ref):
    *_, mapped, mask = _terms(sx, sy, delta, m_ref, xyz_ref, gt_ref, mask_ref)
    loss = jnp.sum(mapped * mask)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    vec = jnp.where(lanes == 0, loss, 0.0)
    out_ref[0, 0] = jnp.broadcast_to(vec, out_ref.shape[2:])


def _bwd_kernel(
    sx, sy, delta, xyz_ref, m_ref, gt_ref, mask_ref, dxyz_ref, dm_ref
):
    x, y, z, u, v, qu, qv, den, du, dv, norm, mapped, mask = _terms(
        sx, sy, delta, m_ref, xyz_ref, gt_ref, mask_ref
    )
    dnorm = mask * jnp.where(norm < delta, norm, delta) / delta
    scale = dnorm / norm
    d_u = scale * du * sx
    d_v = scale * dv * sy
    gate_u = (qu - qu == 0.0).astype(jnp.float32)
    gate_v = (qv - qv == 0.0).astype(jnp.float32)
    d_qu = d_u * gate_u
    d_qv = d_v * gate_v
    d_u_ = d_qu / den
    d_v_ = d_qv / den
    d_z_ = -(qu * d_qu + qv * d_qv) / den

    col = lambda j: m_ref[0, 0:1, j : j + 1]  # noqa: E731
    d_x = col(0) * d_u_ + col(4) * d_v_ + col(8) * d_z_
    d_y = col(1) * d_u_ + col(5) * d_v_ + col(9) * d_z_
    d_z = col(2) * d_u_ + col(6) * d_v_ + col(10) * d_z_
    dxyz_ref[0] = jnp.stack([d_x, d_y, d_z], axis=0)

    sums = []
    for d_row in (d_u_, d_v_, d_z_):
        for operand in (x, y, z, None):
            term = d_row if operand is None else d_row * operand
            sums.append(jnp.sum(term))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = jnp.zeros((1, 128), jnp.float32)
    for j, s in enumerate(sums):
        acc = acc + jnp.where(lanes == j, s, 0.0)
    dm_ref[0, 0] = jnp.broadcast_to(acc, dm_ref.shape[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flow_dir_core(static, xyz_arr, m_arr, gt, mask):
    return _core_fwd(static, xyz_arr, m_arr, gt, mask)[0]


def _block_specs(static, pl):
    h, w, sx, sy, delta = static
    wp = w + (-w) % 128
    block = h  # whole frame per program: per-program overhead beats VMEM here
    in_specs = [
        pl.BlockSpec((1, 3, block, wp), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec((1, 1, 16), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, 2, block, wp), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec((1, block, wp), lambda i, j: (i, j, 0)),
    ]
    return block, wp, in_specs


def _core_fwd(static, xyz_arr, m_arr, gt, mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, sx, sy, delta = static
    n = xyz_arr.shape[0]
    block, wp, in_specs = _block_specs(static, pl)
    nb = h // block
    kernel = functools.partial(_fwd_kernel, sx, sy, delta)
    out = _rt.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, nb, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xyz_arr, m_arr, gt, mask)
    loss_sum = jnp.sum(out[:, :, 0, 0])
    return loss_sum, (xyz_arr, m_arr, gt, mask)


def _core_bwd(static, residuals, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xyz_arr, m_arr, gt, mask = residuals
    h, w, sx, sy, delta = static
    n = xyz_arr.shape[0]
    block, wp, in_specs = _block_specs(static, pl)
    nb = h // block
    kernel = functools.partial(_bwd_kernel, sx, sy, delta)
    d_xyz, d_m = _rt.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 3, block, wp), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3, h, wp), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xyz_arr, m_arr, gt, mask)
    d_m = jnp.sum(d_m[:, :, 0, :16], axis=1) * g
    return d_xyz * g, d_m.reshape(n, 1, 16), jnp.zeros_like(gt), jnp.zeros_like(mask)


_flow_dir_core.defvjp(_core_fwd, _core_bwd)


def _direction_loss(
    source_surfaces,  # (n, h, w, 3) f32 — source-frame camera-space points
    m,  # (n, 3, 4) f32 — folded K_target @ relative[:3]
    flow,  # (n, h, w, 2) observed flow, normalized coords
    mask,  # (n, h, w) soft validity
    xy,  # (h, w, 2) image grid
    image_shape,
    delta,
):
    h, w = image_shape
    n = source_surfaces.shape[0]
    wp = w + (-w) % 128
    scale = (h * w) ** 0.5
    static = (h, w, float(w / scale), float(h / scale), float(delta))

    xyz_arr = jnp.transpose(source_surfaces, (0, 3, 1, 2))
    xyz_arr = jnp.pad(xyz_arr, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    m_arr = jnp.pad(m.reshape(n, 1, 12), ((0, 0), (0, 0), (0, 4)))
    gt = jnp.transpose(xy[None] + flow, (0, 3, 1, 2))
    gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    mask_arr = jnp.pad(mask, ((0, 0), (0, 0), (0, wp - w)))
    return _flow_dir_core(
        static,
        xyz_arr,
        m_arr,
        jax.lax.stop_gradient(gt.astype(jnp.float32)),
        jax.lax.stop_gradient(mask_arr.astype(jnp.float32)),
    )


def flow_loss_pallas(
    surfaces: Float[Array, "b f h w 3"],
    extrinsics: Float[Array, "b f 4 4"],
    intrinsics: Float[Array, "b f 3 3"],
    flows,
    image_shape: tuple[int, int],
    delta: float,
) -> tuple[Float[Array, ""], Float[Array, ""]]:
    """Both flow-loss directions fused; returns (loss_sum, valid_sum).

    Numerically equivalent (up to float reassociation) to `loss_flow`'s
    mapped/masked sums with the huber mapping.
    """
    from ..geometry import rigid_inverse, sample_image_grid

    b, f, h, w, _ = surfaces.shape
    assert b == 1, "flow loss kernel supports batch size 1"
    xy, _ = sample_image_grid(image_shape, dtype=jnp.float32)

    e = extrinsics[0].astype(jnp.float32)
    k = intrinsics[0].astype(jnp.float32)
    surf = surfaces[0].astype(jnp.float32)

    def fold(k_tgt, rel):
        # Rows 0-1 carry K; row 2 is the relative transform's z row alone —
        # K's (0, 0, 1) bottom row is a construction invariant the reference
        # never differentiates through (`geometry.project_camera_space`
        # reads only K rows 0-1), so it must not enter the fold either.
        top = jnp.einsum("nij,njk->nik", k_tgt[:, :2, :3], rel[:, :3, :])
        return jnp.concatenate([top, rel[:, 2:3, :]], axis=1)

    # Forward direction: earlier surfaces through later cameras.
    rel_fwd = jnp.einsum("nij,njk->nik", rigid_inverse(e[1:]), e[:-1])
    m_fwd = fold(k[1:], rel_fwd)
    loss_fwd = _direction_loss(
        surf[:-1], m_fwd, flows.forward[0], flows.forward_mask[0],
        xy, image_shape, delta,
    )

    # Backward direction: later surfaces through earlier cameras.
    rel_bwd = jnp.einsum("nij,njk->nik", rigid_inverse(e[:-1]), e[1:])
    m_bwd = fold(k[:-1], rel_bwd)
    loss_bwd = _direction_loss(
        surf[1:], m_bwd, flows.backward[0], flows.backward_mask[0],
        xy, image_shape, delta,
    )

    valid_sum = jnp.sum(flows.forward_mask[0]) + jnp.sum(flows.backward_mask[0])
    return loss_fwd + loss_bwd, valid_sum.astype(jnp.float32)
