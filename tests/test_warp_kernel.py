"""Pallas warp kernel vs the XLA matmul warp (interpret mode on CPU).

The fused VMEM kernel (ops/pallas/warp_kernel.py) must match the exact
gather-free formulation (ops/warp.py) bit-for-bit in f32: same bilinear
corners, same zeros padding, same vertical-window truncation. The gradient
flows only to the features (the sampling grid is frozen optical flow).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import flowmap_tpu.ops.pallas.warp_kernel as wk
from flowmap_tpu.ops.warp import warp_bilinear_matmul


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    """Run the pallas path in interpret mode on CPU."""
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(wk, "_on_tpu", lambda: True)


def _scene(rng, n, c, h, w, max_disp=0.1):
    x = jnp.asarray(rng.normal(size=(n, c, h, w)).astype(np.float32))
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    base = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)[None].repeat(n, 0)
    flow = (rng.uniform(size=(n, h, w, 2)) - 0.5) * 2 * max_disp
    grid = jnp.asarray(((base + flow) * 2 - 1).astype(np.float32))
    return x, grid


def test_forward_matches_matmul_warp(interpreted_pallas):
    rng = np.random.default_rng(0)
    x, grid = _scene(rng, 2, 5, 16, 24)
    got = wk.warp_features(x, grid, 4)
    want = warp_bilinear_matmul(x, grid, radius=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_feature_grad_matches_matmul_warp(interpreted_pallas):
    rng = np.random.default_rng(1)
    x, grid = _scene(rng, 2, 5, 16, 24)
    g_ref = jax.grad(
        lambda f: jnp.sum(warp_bilinear_matmul(f, grid, radius=4) ** 2)
    )(x)
    g_pl = jax.grad(lambda f: jnp.sum(wk.warp_features(f, grid, 4) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-4)


def test_grid_gets_zero_cotangent(interpreted_pallas):
    rng = np.random.default_rng(2)
    x, grid = _scene(rng, 1, 3, 16, 16)
    gg = jax.grad(lambda g: jnp.sum(wk.warp_features(x, g, 4) ** 2))(grid)
    assert float(jnp.abs(gg).max()) == 0.0


def test_out_of_frame_zero_padding(interpreted_pallas):
    rng = np.random.default_rng(3)
    x, grid = _scene(rng, 1, 2, 16, 16, max_disp=0.02)
    grid = np.array(grid)
    grid[..., :4, 0] = -1.9  # push samples far out horizontally
    grid = jnp.asarray(grid)
    got = wk.warp_features(x + 5.0, grid, 4)
    want = warp_bilinear_matmul(x + 5.0, grid, radius=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_off_tpu_falls_back_to_matmul():
    rng = np.random.default_rng(4)
    x, grid = _scene(rng, 1, 3, 16, 16)
    got = wk.warp_features(x, grid, 4)  # CPU backend -> matmul path
    want = warp_bilinear_matmul(x, grid, radius=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
