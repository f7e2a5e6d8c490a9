"""Fused correspondence-weight kernel vs the XLA composition oracle.

`corr_weights` computes upsample-x2 + warp + weight-MLP in one Pallas pass
from native-resolution features; `corr_weights_ref` is the same math as the
shipped composition (resize_bilinear + warp_bilinear_matmul + einsum MLP).
Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import flowmap_tpu.ops.pallas.corr_weights as cw


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(cw, "_on_tpu", lambda: True)


def _scene(rng, f, hn, wn, max_disp_px=2.5, dtype=jnp.float32):
    h, w = 2 * hn, 2 * wn
    feats = jnp.asarray(
        rng.normal(size=(f, hn, wn, 64)).astype(np.float32), dtype=dtype
    )
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    base = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)[None]
    flow = (rng.uniform(size=(f - 1, h, w, 2)) - 0.5) * 2
    flow = flow * max_disp_px / np.asarray([w, h])
    grid = jnp.asarray(((base + flow) * 2 - 1).astype(np.float32))
    return feats, grid


def _mlp(rng, dtype=jnp.float32):
    def lin(din, dout):
        return {
            "kernel": jnp.asarray(
                rng.normal(size=(din, dout)).astype(np.float32) / din**0.5,
                dtype=dtype,
            ),
            "bias": jnp.asarray(
                rng.normal(size=(dout,)).astype(np.float32) * 0.1, dtype=dtype
            ),
        }

    return [lin(128, 128), lin(128, 64), lin(64, 1)]


def test_forward_matches_oracle(interpreted_pallas):
    rng = np.random.default_rng(0)
    feats, grid = _scene(rng, 3, 16, 24)
    mlp = _mlp(rng)
    got = cw.corr_weights(feats, grid, mlp, 3)
    want = cw.corr_weights_ref(feats, grid, mlp, 3)
    assert got.shape == want.shape == (2, 32, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_forward_large_displacements_and_edges(interpreted_pallas):
    """Samples pushed off the image must follow warp zeros padding."""
    rng = np.random.default_rng(1)
    feats, grid = _scene(rng, 2, 16, 24, max_disp_px=4.5)
    # Shift some positions fully outside the frame.
    grid = grid.at[:, :4, :, 1].add(-0.5)
    mlp = _mlp(rng)
    got = cw.corr_weights(feats, grid, mlp, 5)
    want = cw.corr_weights_ref(feats, grid, mlp, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_forward_bf16(interpreted_pallas):
    rng = np.random.default_rng(2)
    feats, grid = _scene(rng, 2, 16, 24, dtype=jnp.bfloat16)
    mlp = _mlp(rng, dtype=jnp.bfloat16)
    got = cw.corr_weights(feats, grid, mlp, 3)
    want = cw.corr_weights_ref(feats, grid, mlp, 3)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.03)


def test_radius_fallback_matches(interpreted_pallas):
    """radius > _MAX_RADIUS falls back to the oracle path."""
    rng = np.random.default_rng(3)
    feats, grid = _scene(rng, 2, 16, 24)
    mlp = _mlp(rng)
    got = cw.corr_weights(feats, grid, mlp, 16)
    want = cw.corr_weights_ref(feats, grid, mlp, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_gradients_match_oracle(interpreted_pallas):
    rng = np.random.default_rng(4)
    feats, grid = _scene(rng, 3, 16, 24)
    mlp = _mlp(rng)

    def loss_fused(f, m):
        return jnp.sum(cw.corr_weights(f, grid, m, 3) ** 2)

    def loss_ref(f, m):
        return jnp.sum(cw.corr_weights_ref(f, grid, m, 3) ** 2)

    gf, gm = jax.grad(loss_fused, argnums=(0, 1))(feats, mlp)
    rf, rm = jax.grad(loss_ref, argnums=(0, 1))(feats, mlp)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gm), jax.tree_util.tree_leaves(rm)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_grid_cotangent_is_zero(interpreted_pallas):
    rng = np.random.default_rng(5)
    feats, grid = _scene(rng, 2, 16, 24)
    mlp = _mlp(rng)
    g = jax.grad(lambda gr: jnp.sum(cw.corr_weights(feats, gr, mlp, 3)))(grid)
    assert float(jnp.abs(g).max()) == 0.0
