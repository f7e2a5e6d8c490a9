"""Fused correspondence-weight MLP: logits = MLP(concat(warped, later)).

The native-resolution weights path (backbone_midas.py) evaluates a 3-layer
per-pixel MLP on two 64-channel feature maps. As XLA dots this materializes
every 128-wide intermediate to HBM (~340 MB per layer per direction at
reference scale — measured ~10 ms fwd+bwd of a ~3 ms-floor computation).
This kernel keeps all intermediates in VMEM; only the scalar logits ever
reach HBM. The custom VJP recomputes the activations per block and
accumulates parameter gradients across the (sequential) TPU grid in the
output refs.

Kernel layout note: inside the kernel everything runs TRANSPOSED — pixels on
the lane axis, channels on sublanes — expressed purely through `dot_general`
dimension numbers. The scalar-per-pixel output is then a (1, B) tile, which
Mosaic can store directly; the row-major formulation's (B, 1) -> (8, 128)
reshape is an unsupported lane-crossing relayout.

Layer structure matches `_init_weight_mlp([2c, 128, 64, 1])`
(reference `flowmap/model/backbone/backbone_midas.py:16-30,104-112`):
    z0 = wa @ W0a + la @ W0b + b0 ; x0 = relu(z0)
    z1 = x0 @ W1 + b1            ; x1 = relu(z1)
    y  = x1 @ W2 + b2
Off the kernel path (non-TPU and not forced), `weight_mlp` falls back to the
XLA formulation — numerically identical up to f32-accumulation of the dots.
"""

from __future__ import annotations

import jax
from . import runtime as _rt
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLOCK = 2048


def _dg(a, b, contract, preferred=jnp.float32):
    """dot_general with explicit single contraction dims (ca, cb)."""
    ca, cb = contract
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=preferred
    )


def _fwd_T(wa, la, w0a, w0b, b0c, w1, b1c, w2, b2c, cdt):
    """Transposed forward: returns (z0T, x0T, z1T, x1T, yT).

    wa/la: (B, c) row-major blocks; weights row-major; biases as columns
    ((d, 1)); everything contracted via dot_general so no transposes
    materialize. Shapes: z0T (d0, B), z1T (d1, B), yT (1, B).
    """
    # z0T[k, p] = sum_c W0a[c, k] * wa[p, c]  -> contract dim0 of W0a with
    # dim1 of wa.
    z0 = _dg(w0a, wa, (0, 1)) + _dg(w0b, la, (0, 1))
    z0 = z0 + b0c.astype(jnp.float32)
    x0 = jnp.maximum(z0, 0.0)
    z1 = _dg(w1, x0.astype(cdt), (0, 0)) + b1c.astype(jnp.float32)
    x1 = jnp.maximum(z1, 0.0)
    # Final layer as multiply+reduce over sublanes: dots with a unit free
    # dimension (mat-vec shapes) hit a Mosaic lowering bug (dtype-changing
    # vector.broadcast fails the verifier).
    y = jnp.sum(w2.astype(jnp.float32) * x1, axis=0, keepdims=True)
    y = y + b2c.astype(jnp.float32)
    return z0, x0, z1, x1, y


def _fwd_kernel(wa_ref, la_ref, w0a_ref, w0b_ref, b0_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, out_ref):
    cdt = w1_ref.dtype
    _, _, _, _, y = _fwd_T(
        wa_ref[...], la_ref[...], w0a_ref[...], w0b_ref[...], b0_ref[...],
        w1_ref[...], b1_ref[...], w2_ref[...], b2_ref[...], cdt,
    )
    out_ref[...] = y[None]  # (1, 1, B)


def _bwd_kernel(wa_ref, la_ref, w0a_ref, w0b_ref, b0_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, g_ref,
                dwa_ref, dla_ref, dw0a_ref, dw0b_ref, db0_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref):
    cdt = w1_ref.dtype
    wa = wa_ref[...]
    la = la_ref[...]
    w0a = w0a_ref[...]
    w0b = w0b_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    z0, x0, z1, x1, _ = _fwd_T(
        wa, la, w0a, w0b, b0_ref[...], w1, b1_ref[...], w2, b2_ref[...], cdt
    )

    dyT = g_ref[...][0]  # (1, B) f32
    x0c = x0.astype(cdt)

    # dx1T[k, p] = W2[k, 0] * dyT[0, p] — as a broadcast multiply: a K=1
    # dot_general trips a Mosaic lowering bug (dtype-changing
    # vector.broadcast in the verifier).
    dx1 = w2.astype(jnp.float32) * dyT  # (d1, 1) * (1, B) -> (d1, B)
    dz1 = jnp.where(z1 > 0.0, dx1, 0.0)
    dz1c = dz1.astype(cdt)
    dx0 = _dg(w1, dz1c, (1, 0))  # (d0, B)
    dz0 = jnp.where(z0 > 0.0, dx0, 0.0)
    dz0c = dz0.astype(cdt)

    # d_wa[p, c] = sum_k dz0T[k, p] * W0a[c, k] -> contract the d0 axes;
    # dot_general output order (lhs free, rhs free) = (B, c), row-major.
    dwa_ref[...] = _dg(dz0c, w0a, (0, 1)).astype(dwa_ref.dtype)
    dla_ref[...] = _dg(dz0c, w0b, (0, 1)).astype(dla_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0a_ref[...] = jnp.zeros_like(dw0a_ref)
        dw0b_ref[...] = jnp.zeros_like(dw0b_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    # dW0a[c, k] = sum_p wa[p, c] * dz0T[k, p] -> contract the pixel axes.
    dw0a_ref[...] += _dg(wa, dz0c, (0, 1))
    dw0b_ref[...] += _dg(la, dz0c, (0, 1))
    db0_ref[...] += jnp.sum(dz0, axis=1, keepdims=True)  # (d0, 1)
    # dW1[j, k] = sum_p x0T[j, p] * dz1T[k, p].
    dw1_ref[...] += _dg(x0c, dz1c, (1, 1))
    db1_ref[...] += jnp.sum(dz1, axis=1, keepdims=True)  # (d1, 1)
    # (d1, 1) unit-free-dim dot -> multiply+reduce (same Mosaic bug as y).
    dw2_ref[...] += jnp.sum(x1 * dyT, axis=1, keepdims=True)
    db2_ref[...] += jnp.sum(dyT, axis=1, keepdims=True)  # (1, 1)


def _pad_rows(x, p_pad):
    p = x.shape[0]
    if p_pad != p:
        x = jnp.pad(x, ((0, p_pad - p), (0, 0)))
    return x


def _common_specs(c, w0a, w0b, b0, w1, b1, w2, b2):
    row_spec = pl.BlockSpec((_BLOCK, c), lambda i: (i, 0))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    b0c, b1c, b2c = b0[:, None], b1[:, None], b2[:, None]
    in_specs = [
        row_spec, row_spec,
        full(w0a), full(w0b), full(b0c),
        full(w1), full(b1c), full(w2), full(b2c),
    ]
    operands = (w0a, w0b, b0c, w1, b1c, w2, b2c)
    return row_spec, in_specs, operands


def _run_fwd(wa, la, params):
    (w0a, w0b, b0), (w1, b1), (w2, b2) = params
    p, c = wa.shape
    p_pad = -(-p // _BLOCK) * _BLOCK
    nb = p_pad // _BLOCK
    _, in_specs, operands = _common_specs(c, w0a, w0b, b0, w1, b1, w2, b2)
    out = _rt.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, _BLOCK), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 1, _BLOCK), jnp.float32),
    )(_pad_rows(wa, p_pad), _pad_rows(la, p_pad), *operands)
    return out.reshape(p_pad)[:p]


def _run_bwd(wa, la, params, g):
    (w0a, w0b, b0), (w1, b1), (w2, b2) = params
    p, c = wa.shape
    d0 = w0a.shape[1]
    d1 = w1.shape[1]
    p_pad = -(-p // _BLOCK) * _BLOCK
    nb = p_pad // _BLOCK
    g_p = jnp.pad(g.astype(jnp.float32), (0, p_pad - p)).reshape(
        nb, 1, _BLOCK
    )
    row_spec, in_specs, operands = _common_specs(
        c, w0a, w0b, b0, w1, b1, w2, b2
    )
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    outs = _rt.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=in_specs + [pl.BlockSpec((1, 1, _BLOCK), lambda i: (i, 0, 0))],
        out_specs=[
            row_spec, row_spec,
            acc((c, d0)), acc((c, d0)), acc((d0, 1)),
            acc((d0, d1)), acc((d1, 1)), acc((d1, 1)), acc((1, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, c), wa.dtype),
            jax.ShapeDtypeStruct((p_pad, c), la.dtype),
            jax.ShapeDtypeStruct((c, d0), jnp.float32),
            jax.ShapeDtypeStruct((c, d0), jnp.float32),
            jax.ShapeDtypeStruct((d0, 1), jnp.float32),
            jax.ShapeDtypeStruct((d0, d1), jnp.float32),
            jax.ShapeDtypeStruct((d1, 1), jnp.float32),
            jax.ShapeDtypeStruct((d1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(_pad_rows(wa, p_pad), _pad_rows(la, p_pad), *operands, g_p)
    dwa, dla, dw0a, dw0b, db0, dw1, db1, dw2, db2 = outs
    return (
        dwa[:p],
        dla[:p],
        (
            (dw0a.astype(w0a.dtype), dw0b.astype(w0b.dtype),
             db0[:, 0].astype(b0.dtype)),
            (dw1.astype(w1.dtype), db1[:, 0].astype(b1.dtype)),
            (dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype)),
        ),
    )


def _reference(wa, la, params):
    """XLA fallback — identical math (f32-accumulated dots)."""
    (w0a, w0b, b0), (w1, b1), (w2, b2) = params

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    z0 = dot(wa, w0a) + dot(la, w0b) + b0.astype(jnp.float32)
    x0 = jnp.maximum(z0, 0.0)
    z1 = dot(x0.astype(w1.dtype), w1) + b1.astype(jnp.float32)
    x1 = jnp.maximum(z1, 0.0)
    y = dot(x1.astype(w2.dtype), w2) + b2.astype(jnp.float32)
    return y[:, 0]


@jax.custom_vjp
def weight_mlp(wa, la, params):
    """logits (p,) f32 from two (p, c) feature maps and MLP params.

    params = ((W0a, W0b, b0), (W1, b1), (W2, b2)), the first layer split by
    linearity over the concat (W0 = [W0a; W0b]); b2 has shape (1,)
    (matching `_init_weight_mlp`).
    """
    if not _rt.kernels_enabled():
        return _reference(wa, la, params)
    return _run_fwd(wa, la, params)


def _vjp_fwd(wa, la, params):
    return weight_mlp(wa, la, params), (wa, la, params)


def _vjp_bwd(residuals, g):
    wa, la, params = residuals
    if not _rt.kernels_enabled():
        _, vjp = jax.vjp(_reference, wa, la, params)
        return vjp(g)
    return _run_bwd(wa, la, params, g)


weight_mlp.defvjp(_vjp_fwd, _vjp_bwd)
