"""Parity of the static shift-window warp vs torch-semantics grid_sample.

`warp_bilinear_shifts` (ops/warp.py) covers the native-resolution
correspondence-weight warp whenever both displacement radii are small. It
must match grid_sample(zeros, align_corners=False) exactly (values and
feature gradients) for any displacement within the declared radii.
"""

import jax
import jax.numpy as jnp
import pytest

from flowmap_tpu.ops.grid_sample import grid_sample_2d
from flowmap_tpu.ops.warp import warp_bilinear_shifts


def _displacement_grid(key, n, h, w, max_dx, max_dy):
    k1, k2 = jax.random.split(key)
    disp = jnp.stack(
        [
            jax.random.uniform(k1, (n, h, w), minval=-max_dx, maxval=max_dx)
            / w
            * 2,
            jax.random.uniform(k2, (n, h, w), minval=-max_dy, maxval=max_dy)
            / h
            * 2,
        ],
        -1,
    )
    xy = jnp.stack(
        jnp.meshgrid(
            (jnp.arange(w) + 0.5) / w, (jnp.arange(h) + 0.5) / h, indexing="xy"
        ),
        -1,
    )
    return (xy * 2 - 1)[None] + disp


@pytest.mark.parametrize("radii", [(2, 2), (4, 5)])
def test_shift_warp_matches_grid_sample(radii):
    ry, rx = radii
    key = jax.random.PRNGKey(0)
    n, h, w, c = 3, 16, 24, 5
    feats = jax.random.normal(key, (n, h, w, c))
    grid = _displacement_grid(key, n, h, w, rx - 1, ry - 1)

    ref = grid_sample_2d(
        feats.transpose(0, 3, 1, 2), grid, padding_mode="zeros"
    ).transpose(0, 2, 3, 1)
    out = warp_bilinear_shifts(feats, grid, ry, rx)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_shift_warp_feature_gradients():
    key = jax.random.PRNGKey(1)
    n, h, w, c = 2, 12, 20, 4
    feats = jax.random.normal(key, (n, h, w, c))
    grid = jax.lax.stop_gradient(_displacement_grid(key, n, h, w, 3, 2))
    g = jax.random.normal(key, (n, h, w, c))

    def via_shifts(f):
        return jnp.sum(warp_bilinear_shifts(f, grid, 3, 4) * g)

    def via_gather(f):
        out = grid_sample_2d(
            f.transpose(0, 3, 1, 2), grid, padding_mode="zeros"
        ).transpose(0, 2, 3, 1)
        return jnp.sum(out * g)

    g1 = jax.grad(via_shifts)(feats)
    g2 = jax.grad(via_gather)(feats)
    assert float(jnp.abs(g1 - g2).max()) < 1e-5


def test_shift_warp_drops_displacements_beyond_radius():
    # A displacement larger than the radius contributes nothing (weight 0),
    # mirroring how callers size radii to cover the actual flow.
    n, h, w, c = 1, 8, 8, 3
    feats = jnp.ones((n, h, w, c))
    xy = jnp.stack(
        jnp.meshgrid(
            (jnp.arange(w) + 0.5) / w, (jnp.arange(h) + 0.5) / h, indexing="xy"
        ),
        -1,
    )
    grid = (xy * 2 - 1)[None] + jnp.asarray([0.0, 10 / h * 2])
    out = warp_bilinear_shifts(feats, grid, 2, 2)
    assert float(jnp.abs(out).max()) == 0.0
