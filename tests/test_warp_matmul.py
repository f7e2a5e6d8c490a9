"""Matmul warp vs the gather grid_sample reference (exact within the radius)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmap_tpu.ops.grid_sample import grid_sample_2d
from flowmap_tpu.ops.warp import radius_for_flows, warp_bilinear_matmul


def _displacement_grid(rng, n, h, w, max_disp=0.08):
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    base = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)[None].repeat(n, 0)
    flow = (rng.uniform(size=(n, h, w, 2)) - 0.5) * 2 * max_disp
    return ((base + flow) * 2 - 1).astype(np.float32), flow


def test_matches_gather_grid_sample():
    rng = np.random.default_rng(0)
    n, c, h, w = 3, 5, 24, 32
    x = jnp.asarray(rng.normal(size=(n, c, h, w)).astype(np.float32))
    grid_np, flow = _displacement_grid(rng, n, h, w)
    grid = jnp.asarray(grid_np)

    radius = radius_for_flows(flow[..., 1], h)
    got = warp_bilinear_matmul(x, grid, radius=radius)
    want = grid_sample_2d(x, grid, padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_out_of_frame_zero_padding():
    rng = np.random.default_rng(1)
    n, c, h, w = 1, 2, 16, 16
    x = jnp.asarray(rng.normal(size=(n, c, h, w)).astype(np.float32) + 5.0)
    # Push some samples far outside horizontally (x padding is exact).
    grid_np, flow = _displacement_grid(rng, n, h, w, max_disp=0.02)
    grid_np[..., :4, 0] = -1.8
    got = warp_bilinear_matmul(jnp.asarray(x), jnp.asarray(grid_np), radius=4)
    want = grid_sample_2d(jnp.asarray(x), jnp.asarray(grid_np), padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_gather():
    rng = np.random.default_rng(2)
    n, c, h, w = 1, 3, 12, 16
    x0 = rng.normal(size=(n, c, h, w)).astype(np.float32)
    grid_np, flow = _displacement_grid(rng, n, h, w, max_disp=0.05)
    grid = jnp.asarray(grid_np)
    radius = radius_for_flows(flow[..., 1], h)

    g_mm = jax.grad(lambda x: jnp.sum(warp_bilinear_matmul(x, grid, radius) ** 2))(
        jnp.asarray(x0)
    )
    g_ref = jax.grad(
        lambda x: jnp.sum(grid_sample_2d(x, grid, padding_mode="zeros") ** 2)
    )(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref), atol=1e-4)

    # Gradients w.r.t. the sampling grid must match too.
    gg_mm = jax.grad(
        lambda g: jnp.sum(warp_bilinear_matmul(jnp.asarray(x0), g, radius) ** 2)
    )(grid)
    gg_ref = jax.grad(
        lambda g: jnp.sum(grid_sample_2d(jnp.asarray(x0), g, padding_mode="zeros") ** 2)
    )(grid)
    np.testing.assert_allclose(np.asarray(gg_mm), np.asarray(gg_ref), atol=1e-3)
