"""Explicit shard_map collectives for frame-axis context parallelism.

The GSPMD path (`parallel/mesh.py`) lets the partitioner generate halo
exchanges and the distributed pose-chain scan. This module provides the same
primitives as explicit `shard_map` collectives — deterministic communication
patterns for performance work and a reference for what the partitioner should
be emitting:

- `halo_exchange_next`: every shard receives its right neighbor's first
  frame (the adjacent-frame pair terms need exactly one boundary frame).
- `distributed_pose_chain`: the global prefix product P_n = T_0 @ ... @ T_{n-1}
  over a sharded pair axis — local `associative_scan` + all-gather of per-shard
  partial products + an exclusive scan over shards (log-depth within shards,
  one small collective across them).

Both are differentiable (shard_map transposes ppermute/all_gather in the
backward pass) and validated against their single-device equivalents in
`tests/test_collectives.py`.
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# ---------------------------------------------------------------------------
# Explicit-collectives mode (VERDICT r4 item 3 / SURVEY §7.1 step 10).
#
# When active (set by `make_sharded_train_step(..., collectives="explicit")`
# around the traced step), frame-sharding-aware ops route their cross-shard
# data movement through the hand-written primitives below instead of leaving
# it to the GSPMD partitioner: `align_surfaces` fetches its later-frame
# surfaces via an explicit one-frame ppermute halo and composes the pose
# chain with the distributed prefix product. Numerically identical to the
# GSPMD path (tests/test_explicit_step.py proves step-equivalence on the
# 8-device CPU mesh); the point is deterministic, profileable communication.
# ---------------------------------------------------------------------------

_explicit_ctx: list[tuple[Mesh, str]] = []


@contextlib.contextmanager
def explicit_collectives(mesh: Mesh, axis_name: str = "frame"):
    """Trace-time flag: ops that support explicit collectives consult this.

    Must wrap the *traced* step body (trace happens inside the jitted
    callable's first execution), not merely the `jax.jit` call site.
    """
    _explicit_ctx.append((mesh, axis_name))
    try:
        yield
    finally:
        _explicit_ctx.pop()


def current_explicit_mesh() -> tuple[Mesh, str] | None:
    return _explicit_ctx[-1] if _explicit_ctx else None


def halo_exchange_next(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: return the next shard's leading frame slice.

    x: (local_frames, ...) — returns (1, ...) from the right neighbor (the
    last shard receives zeros; its pair terms end at the global boundary).
    """
    num = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # Send our first frame to the left neighbor.
    received = jax.lax.ppermute(
        x[:1],
        axis_name,
        perm=[(i, (i - 1) % num) for i in range(num)],
    )
    # The last shard's "neighbor" wrapped around; zero it.
    is_last = idx == num - 1
    return jnp.where(is_last, jnp.zeros_like(received), received)


def _matmul_scan(chain: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b), chain, axis=0
    )


def _distributed_prefix_product(local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: local (n_local, 4, 4) chain -> global inclusive
    prefix products for the local slice."""
    local_prefix = _matmul_scan(local)  # (n_local, 4, 4)
    shard_product = local_prefix[-1]  # product of this shard's chain

    # All-gather every shard's total product (tiny: num_shards x 4 x 4).
    all_products = jax.lax.all_gather(shard_product, axis_name)  # (S, 4, 4)
    # Exclusive prefix over shards: offset_s = prod_{t < s} product_t.
    inclusive = _matmul_scan(all_products)
    idx = jax.lax.axis_index(axis_name)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=local.dtype), shard_product.shape)
    offset = jnp.where(idx == 0, eye, inclusive[jnp.maximum(idx - 1, 0)])

    return jnp.einsum("ij,njk->nik", offset, local_prefix)


def shifted_next_frames(
    x: jnp.ndarray, mesh: Mesh, axis_name: str = "frame"
) -> jnp.ndarray:
    """Global `concat(x[1:], zeros[1])` along a mesh-sharded frame axis,
    with the cross-shard boundary frame moved by an explicit ppermute halo
    (one frame's data per shard boundary, riding ICI).

    x: (f, ...) with f divisible by the mesh axis. `later(x) == out[:f-1]`.
    """

    def body(local):
        halo = halo_exchange_next(local, axis_name)
        return jnp.concatenate([local[1:], halo], axis=0)

    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name)
    )(x)


def explicit_pose_chain(
    inverse_relative_transformations: jnp.ndarray,  # (pairs, 4, 4)
    mesh: Mesh,
    axis_name: str = "frame",
) -> jnp.ndarray:
    """`get_extrinsics` via the distributed prefix product, for any pair
    count: pads the chain with identities to a multiple of the mesh axis
    (exact — appended identities cannot affect earlier prefix products),
    runs `distributed_pose_chain`, and slices back."""
    p = inverse_relative_transformations.shape[0]
    size = mesh.shape[axis_name]
    pad = (-p) % size
    chain = inverse_relative_transformations
    if pad:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=chain.dtype), (pad, 4, 4))
        chain = jnp.concatenate([chain, eye], axis=0)
    return distributed_pose_chain(chain, mesh, axis_name)[: p + 1]


def distributed_pose_chain(
    inverse_relative_transformations: jnp.ndarray,  # (pairs, 4, 4), global
    mesh: Mesh,
    axis_name: str = "frame",
) -> jnp.ndarray:
    """get_extrinsics over a mesh-sharded pair axis.

    Returns (pairs + 1, 4, 4): identity-prefixed global prefix products,
    numerically identical to `ops.geometry.get_extrinsics` (validated on the
    CPU mesh). The pair count must be divisible by the mesh axis size.
    """
    shard = jax.shard_map(
        partial(_distributed_prefix_product, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
    )
    prefix = shard(inverse_relative_transformations)
    identity = jnp.eye(4, dtype=prefix.dtype)[None]
    return jnp.concatenate([identity, prefix], axis=0)
