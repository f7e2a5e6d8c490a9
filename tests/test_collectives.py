"""Explicit shard_map collectives vs single-device equivalents."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from flowmap_tpu.ops.geometry import get_extrinsics
from flowmap_tpu.parallel.collectives import (
    distributed_pose_chain,
    halo_exchange_next,
)


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("frame",))


def _random_rigid(rng, n):
    from flowmap_tpu.ops.procrustes import quaternion_to_matrix

    qs = rng.normal(size=(n, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    out = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    out[:, :3, :3] = np.asarray(quaternion_to_matrix(jnp.asarray(qs)))
    out[:, :3, 3] = rng.normal(size=(n, 3))
    return out


def test_distributed_pose_chain_matches_serial():
    rng = np.random.default_rng(0)
    rel = jnp.asarray(_random_rigid(rng, 16))
    mesh = _mesh()
    got = distributed_pose_chain(rel, mesh)
    want = get_extrinsics(rel[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_distributed_pose_chain_gradients():
    rng = np.random.default_rng(1)
    rel = jnp.asarray(_random_rigid(rng, 16))
    mesh = _mesh()

    def loss_dist(rel):
        return jnp.sum(distributed_pose_chain(rel, mesh)[..., :3, 3] ** 2)

    def loss_serial(rel):
        return jnp.sum(get_extrinsics(rel[None])[0][..., :3, 3] ** 2)

    g_dist = jax.jit(jax.grad(loss_dist))(rel)
    g_serial = jax.jit(jax.grad(loss_serial))(rel)
    np.testing.assert_allclose(
        np.asarray(g_dist), np.asarray(g_serial), atol=1e-3, rtol=1e-3
    )


def test_halo_exchange_next():
    mesh = _mesh()
    x = jnp.arange(16.0).reshape(16, 1)  # 2 frames per shard

    def body(local):
        return halo_exchange_next(local, "frame")

    out = jax.shard_map(body, mesh=mesh, in_specs=P("frame"), out_specs=P("frame"))(x)
    out = np.asarray(out).reshape(-1)
    # Each shard (2 frames) receives the next shard's first frame; shard i
    # owns frames [2i, 2i+1], so it receives value 2(i+1); the last gets 0.
    want = [2.0 * (i + 1) for i in range(7)] + [0.0]
    np.testing.assert_allclose(out, want)
