"""Fused Pallas tracking-loss kernels vs the XLA formulation (interpret mode).

`ops/pallas/track_loss.py` must match `loss/loss.py:_track_loss_packed_fused`
(value and gradients w.r.t. surfaces, extrinsics, and intrinsics). The XLA
path is itself the parity reference for `flowmap/loss/loss_tracking.py` +
`flowmap/model/projection.py:255-298`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from flowmap_tpu.loss.loss import LossTrackingCfg, _track_loss_packed_fused
from flowmap_tpu.ops.pallas import track_loss as tl
from flowmap_tpu.types import ModelOutput, TracksPacked


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _rotation(rng, scale=0.2):
    w = rng.normal(size=3) * scale
    wx = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], np.float64
    )
    from scipy.linalg import expm

    return expm(wx)


def _scene(rng, f=14, h=24, w=32, s=3, l=7, p=13):
    surfaces = rng.normal(size=(1, f, h, w, 3)).astype(np.float32)
    surfaces[..., 2] += 4.0  # positive-ish depths
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

    starts = np.linspace(0, f - l, s).astype(np.int32)
    xy = rng.uniform(-0.05, 1.05, size=(1, s, l, p, 2)).astype(np.float32)
    vis = rng.uniform(size=(1, s, l, p)) > 0.2
    packed = TracksPacked(
        xy=jnp.asarray(xy),
        visibility=jnp.asarray(vis),
        starts=jnp.asarray(starts),
    )
    return (
        jnp.asarray(surfaces),
        jnp.asarray(extrinsics),
        jnp.asarray(intrinsics),
        packed,
        (h, w),
    )


def _xla_loss(surfaces, extrinsics, intrinsics, packed, shape):
    cfg = LossTrackingCfg()
    out = ModelOutput(
        depths=None,
        surfaces=surfaces,
        intrinsics=intrinsics,
        extrinsics=extrinsics,
        backward_correspondence_weights=None,
    )
    return _track_loss_packed_fused(cfg, packed, out, shape)


def test_forward_matches_xla(interpreted_pallas):
    rng = np.random.default_rng(0)
    surfaces, extrinsics, intrinsics, packed, shape = _scene(rng)
    loss_ref, valid_ref = _xla_loss(
        surfaces, extrinsics, intrinsics, packed, shape
    )
    loss, valid = tl.track_loss_pallas(
        surfaces, extrinsics, intrinsics, packed, shape, delta=0.01
    )
    assert float(valid) == float(valid_ref)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)


def test_gradients_match_xla(interpreted_pallas):
    rng = np.random.default_rng(1)
    surfaces, extrinsics, intrinsics, packed, shape = _scene(rng)

    def f_kernel(surf, ext, intr):
        loss, valid = tl.track_loss_pallas(
            surf, ext, intr, packed, shape, delta=0.01
        )
        return loss / jnp.maximum(valid, 1.0)

    def f_ref(surf, ext, intr):
        loss, valid = _xla_loss(surf, ext, intr, packed, shape)
        return loss / jnp.maximum(valid, 1.0)

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


def test_visibility_padding_is_inert(interpreted_pallas):
    # Zero-visibility points and padded window rows must not contribute.
    rng = np.random.default_rng(2)
    surfaces, extrinsics, intrinsics, packed, shape = _scene(rng)
    packed_off = TracksPacked(
        xy=packed.xy,
        visibility=jnp.zeros_like(packed.visibility),
        starts=packed.starts,
    )
    loss, valid = tl.track_loss_pallas(
        surfaces, extrinsics, intrinsics, packed_off, shape, delta=0.01
    )
    assert float(loss) == 0.0
    assert float(valid) == 0.0
