"""Bit-parity tests of grid_sample / resize against torch (CPU reference).

The reference's behavior depends on exact `F.grid_sample(align_corners=False)`
and `F.interpolate(bilinear)` semantics (SURVEY.md §7.3 hard part #2); torch
(CPU build) is available in the image and serves as the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from flowmap_tpu.ops.grid_sample import grid_sample_2d, grid_sample_points
from flowmap_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_matches_torch(padding_mode):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 9, 13)).astype(np.float32)
    # Include in-range, boundary, and far out-of-range coordinates.
    grid = rng.uniform(-1.7, 1.7, size=(2, 5, 7, 2)).astype(np.float32)

    want = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid), padding_mode))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_points_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    xy = rng.uniform(-0.2, 1.2, size=(4, 11, 2)).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy((xy * 2 - 1)[:, :, None, :]),
        mode="bilinear",
        padding_mode="border",
        align_corners=False,
    ).numpy()[..., 0]
    got = np.asarray(grid_sample_points(jnp.asarray(x), jnp.asarray(xy)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape", [(6, 8), (20, 30), (9, 13), (18, 26), (3, 13), (27, 39), (36, 52)])
def test_resize_matches_torch_interpolate(shape):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 9, 13)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), shape, mode="bilinear", align_corners=False
    ).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), shape))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_gradients():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 2, 6, 6)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 4, 4, 2)).astype(np.float32))

    def f_img(x):
        return jnp.sum(grid_sample_2d(x, grid) ** 2)

    def f_grid(grid):
        return jnp.sum(grid_sample_2d(x, grid) ** 2)

    gx = jax.grad(f_img)(x)
    gg = jax.grad(f_grid)(grid)
    assert bool(jnp.all(jnp.isfinite(gx)))
    assert bool(jnp.all(jnp.isfinite(gg)))
    # Finite-difference check on the grid gradient (the subtle path).
    eps = 1e-3
    d = np.zeros(grid.shape, np.float32)
    d[0, 1, 2, 0] = eps
    num = (f_grid(grid + d) - f_grid(grid - d)) / (2 * eps)
    np.testing.assert_allclose(float(num), float(gg[0, 1, 2, 0]), rtol=2e-2, atol=1e-3)


def test_midas_upsample2x_matches_torch_align_corners():
    from flowmap_tpu.model.backbone.midas_net import _upsample2x

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)  # NHWC
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        scale_factor=2,
        mode="bilinear",
        align_corners=True,
    ).numpy()
    got = np.asarray(_upsample2x(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)
