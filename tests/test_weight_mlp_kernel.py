"""Fused weight-MLP Pallas kernel vs the XLA formulation (interpret mode).

`ops/pallas/weight_mlp.py` must match its `_reference` (value + gradients
w.r.t. both feature maps and all MLP parameters) — which is itself the
linearity-split form of the reference's concat-MLP
(`flowmap/model/backbone/backbone_midas.py:16-30,104-112`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.ops.pallas import runtime
from flowmap_tpu.ops.pallas import weight_mlp as wm


@pytest.fixture()
def forced(monkeypatch):
    with runtime.pallas_mode("force"):
        yield


def _case(p=1500, c=64, d0=128, d1=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3, dtype)
    wa, la = mk(p, c), mk(p, c)
    params = (
        (mk(c, d0), mk(c, d0), mk(d0)),
        (mk(d0, d1), mk(d1)),
        (mk(d1, 1), mk(1)),  # b2 shape (1,), matching _init_weight_mlp
    )
    return wa, la, params


def test_forward_matches_reference(forced):
    wa, la, params = _case()
    got = wm.weight_mlp(wa, la, params)
    want = wm._reference(wa, la, params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_forward_padding_rows(forced):
    # p not divisible by the block: padded rows must not leak.
    wa, la, params = _case(p=wm._BLOCK + 7)
    got = wm.weight_mlp(wa, la, params)
    want = wm._reference(wa, la, params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gradients_match_reference(forced):
    wa, la, params = _case(p=900)

    def loss_k(wa, la, params):
        y = wm.weight_mlp(wa, la, params)
        return jnp.sum(jnp.sin(y) * jnp.linspace(0.5, 1.5, y.shape[0]))

    def loss_r(wa, la, params):
        y = wm._reference(wa, la, params)
        return jnp.sum(jnp.sin(y) * jnp.linspace(0.5, 1.5, y.shape[0]))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(wa, la, params)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(wa, la, params)
    flat_k, _ = jax.tree_util.tree_flatten(gk)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    assert len(flat_k) == len(flat_r)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-4, atol=2e-4,
        )


def test_bf16_inputs(forced):
    wa, la, params = _case(dtype=jnp.bfloat16)
    got = wm.weight_mlp(wa, la, params)
    want = wm._reference(wa, la, params)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_fallback_path_off():
    wa, la, params = _case(p=257)
    with runtime.pallas_mode("off"):
        out = wm.weight_mlp(wa, la, params)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(wm._reference(wa, la, params)),
        rtol=1e-6,
    )
