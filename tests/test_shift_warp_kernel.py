"""Pallas shift-stencil warp kernel vs the XLA stencil (interpret mode).

`ops/pallas/shift_warp.py` must match `ops/warp.py:warp_bilinear_shifts`
(itself verified against torch-semantics grid_sample in
tests/test_warp_shifts.py) in both directions. The gradient flows only to
the features; the sampling grid is frozen optical flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import flowmap_tpu.ops.pallas.shift_warp as sw
from flowmap_tpu.ops.warp import warp_bilinear_shifts


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(sw, "_on_tpu", lambda: True)


def _scene(rng, n, h, w, c, max_dx, max_dy):
    feats = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    base = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)[None].repeat(n, 0)
    flow = (rng.uniform(size=(n, h, w, 2)) - 0.5) * 2
    flow[..., 0] *= max_dx / w
    flow[..., 1] *= max_dy / h
    grid = jnp.asarray(((base + flow) * 2 - 1).astype(np.float32))
    return feats, grid


def test_forward_matches_xla_stencil(interpreted_pallas):
    rng = np.random.default_rng(0)
    feats, grid = _scene(rng, 2, 16, 24, 5, max_dx=3, max_dy=2)
    got = sw.warp_shifts_tpu(feats, grid, 3, 4)
    want = warp_bilinear_shifts(feats, grid, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_grad_matches_xla_stencil(interpreted_pallas):
    rng = np.random.default_rng(1)
    feats, grid = _scene(rng, 2, 16, 24, 5, max_dx=3, max_dy=2)
    grid = jax.lax.stop_gradient(grid)
    g_ref = jax.grad(
        lambda f: jnp.sum(warp_bilinear_shifts(f, grid, 3, 4) ** 2)
    )(feats)
    g_pl = jax.grad(lambda f: jnp.sum(sw.warp_shifts_tpu(f, grid, 3, 4) ** 2))(
        feats
    )
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-4)


def test_grid_gets_zero_cotangent(interpreted_pallas):
    rng = np.random.default_rng(2)
    feats, grid = _scene(rng, 1, 8, 16, 3, max_dx=2, max_dy=2)
    d_grid = jax.grad(
        lambda gr: jnp.sum(sw.warp_shifts_tpu(feats, gr, 2, 2))
    )(grid)
    assert float(jnp.abs(d_grid).max()) == 0.0
