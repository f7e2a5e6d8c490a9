"""Fused Pallas flow-loss kernel vs the XLA formulation (interpret mode).

`ops/pallas/flow_loss.py` must match `loss/loss.py:loss_flow` (value and
gradients w.r.t. surfaces, extrinsics, and intrinsics), which is itself the
parity reference for `flowmap/loss/loss_flow.py:31-70`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from flowmap_tpu.loss.loss import LossFlowCfg, loss_flow
from flowmap_tpu.ops.pallas import flow_loss as fl
from flowmap_tpu.types import Flows, ModelOutput


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _rotation(rng, scale=0.15):
    w = rng.normal(size=3) * scale
    wx = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], np.float64
    )
    from scipy.linalg import expm

    return expm(wx)


def _scene(rng, f=6, h=16, w=24):
    surfaces = rng.normal(size=(1, f, h, w, 3)).astype(np.float32)
    surfaces[..., 2] += 4.0
    extrinsics = np.zeros((1, f, 4, 4), np.float32)
    for i in range(f):
        e = np.eye(4)
        e[:3, :3] = _rotation(rng)
        e[:3, 3] = rng.normal(size=3) * 0.3
        extrinsics[0, i] = e
    intrinsics = np.zeros((1, f, 3, 3), np.float32)
    intrinsics[0, :, 0, 0] = 1.2 + 0.1 * rng.normal(size=f)
    intrinsics[0, :, 1, 1] = 1.3 + 0.1 * rng.normal(size=f)
    intrinsics[0, :, 0, 2] = 0.5
    intrinsics[0, :, 1, 2] = 0.5
    intrinsics[0, :, 2, 2] = 1.0
    flows = Flows(
        forward=jnp.asarray(
            rng.normal(size=(1, f - 1, h, w, 2)).astype(np.float32) * 0.05
        ),
        backward=jnp.asarray(
            rng.normal(size=(1, f - 1, h, w, 2)).astype(np.float32) * 0.05
        ),
        forward_mask=jnp.asarray(
            rng.uniform(size=(1, f - 1, h, w)).astype(np.float32)
        ),
        backward_mask=jnp.asarray(
            rng.uniform(size=(1, f - 1, h, w)).astype(np.float32)
        ),
    )
    return (
        jnp.asarray(surfaces),
        jnp.asarray(extrinsics),
        jnp.asarray(intrinsics),
        flows,
        (h, w),
    )


def _ref_loss(surfaces, extrinsics, intrinsics, flows, shape):
    out = ModelOutput(
        depths=None,
        surfaces=surfaces,
        intrinsics=intrinsics,
        extrinsics=extrinsics,
        backward_correspondence_weights=None,
    )
    return loss_flow(LossFlowCfg(), flows, out, shape)


def test_forward_matches_xla(interpreted_pallas):
    rng = np.random.default_rng(0)
    surfaces, extrinsics, intrinsics, flows, shape = _scene(rng)
    want = _ref_loss(surfaces, extrinsics, intrinsics, flows, shape)
    loss_sum, valid_sum = fl.flow_loss_pallas(
        surfaces, extrinsics, intrinsics, flows, shape, delta=0.01
    )
    got = loss_sum / jnp.maximum(valid_sum, 1.0)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_gradients_match_xla(interpreted_pallas):
    rng = np.random.default_rng(1)
    surfaces, extrinsics, intrinsics, flows, shape = _scene(rng)

    def f_kernel(surf, ext, intr):
        loss_sum, valid_sum = fl.flow_loss_pallas(
            surf, ext, intr, flows, shape, delta=0.01
        )
        return loss_sum / jnp.maximum(valid_sum, 1.0)

    def f_ref(surf, ext, intr):
        return _ref_loss(surf, ext, intr, flows, shape)

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(
        surfaces, extrinsics, intrinsics
    )
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(surfaces, extrinsics, intrinsics)
    for got, want, name in zip(
        g_kernel, g_ref, ("surfaces", "extrinsics", "intrinsics")
    ):
        scale = float(jnp.abs(want).max()) + 1e-12
        err = float(jnp.abs(got - want).max()) / scale
        assert err < 2e-4, f"{name}: rel err {err}"
