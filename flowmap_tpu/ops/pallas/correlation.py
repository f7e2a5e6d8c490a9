"""Fused global-correlation softmax-expectation (Pallas TPU kernel).

GMFlow's global matching (`third_party/gmflow/gmflow/matching.py:7-37` in the
reference) computes

    corr = f0 @ f1^T / sqrt(c)          # (L, L), L = H*W
    flow = softmax(corr) @ grid - grid  # expected correspondence

materializing the full (L, L) correlation volume in HBM — at 1/8 scale of a
640x896 flow input that is a 321 MB tensor per frame pair. This kernel fuses
the three steps flash-attention-style: each program computes one query block's
correlation against the FULL key set in VMEM (two MXU matmuls + a row softmax)
and writes only the (block, 2) expectation. The correlation volume never
touches HBM.

Used by the frozen GMFlow predictor (inference only, no VJP needed). Falls
back to the jnp reference implementation on non-TPU backends or when shapes
exceed the VMEM budget.
"""

from __future__ import annotations

import jax
from . import runtime as _rt
import jax.numpy as jnp
from jaxtyping import Array, Float

_BLOCK_Q = 256
# VMEM budget: keys (L, c) + scores (BLOCK_Q, L) + grid (L, 2), all fp32.
_VMEM_LIMIT_BYTES = 14 * 1024 * 1024


def _reference(f0, f1, grid):
    c = f0.shape[-1]
    corr = jnp.einsum("blc,bmc->blm", f0, f1) / (c**0.5)
    prob = jax.nn.softmax(corr, axis=-1)
    return jnp.einsum("blm,md->bld", prob, grid)


def _kernel(f0_ref, f1_ref, grid_ref, out_ref):
    import jax.numpy as jnp

    q = f0_ref[:]  # (BLOCK_Q, c)
    k = f1_ref[:]  # (L, c)
    g = grid_ref[:]  # (L, 2)
    c = q.shape[-1]
    scores = jnp.dot(
        q, k.T, preferred_element_type=jnp.float32
    ) * (1.0 / (c**0.5))
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out_ref[:] = jnp.dot(
        p, g, preferred_element_type=jnp.float32
    ) / denom


def _pallas_call(f0, f1, grid, block_q):
    from jax.experimental import pallas as pl

    b, length, c = f0.shape
    num_blocks = length // block_q

    def run_single(f0_b, f1_b):
        return _rt.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((length, 2), jnp.float32),
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((block_q, c), lambda i: (i, 0)),
                pl.BlockSpec((length, c), lambda i: (0, 0)),
                pl.BlockSpec((length, 2), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_q, 2), lambda i: (i, 0)),
        )(f0_b, f1_b, grid)

    return jax.vmap(run_single)(f0, f1)


def global_correlation_expectation(
    f0: Float[Array, "b l c"],
    f1: Float[Array, "b l c"],
    grid: Float[Array, "l 2"],
) -> Float[Array, "b l 2"]:
    """softmax(f0 f1^T / sqrt(c)) @ grid without materializing (l, l)."""
    b, length, c = f0.shape

    vmem_needed = 4 * (length * c + _BLOCK_Q * length + length * 2 + _BLOCK_Q * c)
    on_tpu = _rt.kernels_enabled()
    if not on_tpu or length % _BLOCK_Q != 0 or vmem_needed > _VMEM_LIMIT_BYTES:
        # Fall back to a query-chunked jnp formulation (still avoids the full
        # (l, l) volume when chunking applies).
        if length > 4096:
            chunks = []
            for start in range(0, length, 2048):
                part = f0[:, start : start + 2048]
                corr = jnp.einsum("blc,bmc->blm", part, f1) / (c**0.5)
                prob = jax.nn.softmax(corr, axis=-1)
                chunks.append(jnp.einsum("blm,md->bld", prob, grid))
            return jnp.concatenate(chunks, axis=1)
        return _reference(f0, f1, grid)

    return _pallas_call(f0, f1, grid, _BLOCK_Q)
