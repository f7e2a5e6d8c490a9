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

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


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
