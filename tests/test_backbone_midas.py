"""Unit tests for the MiDaS backbone wrapper (correspondence-weight path).

The concat-MLP split (backbone_midas.py) must match the reference
formulation MLP(concat([warped_earlier, later])) exactly up to float
reassociation; reference: flowmap/model/backbone/backbone_midas.py:92-112.
"""

import jax
import jax.numpy as jnp
import pytest

from flowmap_tpu.model.backbone.backbone_midas import (
    BackboneMidasCfg,
    _apply_weight_mlp,
    apply_midas,
    init_midas,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(SyntheticSceneCfg(num_frames=4, image_shape=(64, 96)))


def test_weight_mlp_split_matches_concat(scene):
    batch, flows, _ = scene
    cfg = BackboneMidasCfg(
        pretrained=False,
        mapping="exp",
        warp_impl="gather",
        compute_dtype="float32",
        remat=False,
        weights_resolution="full",
    )
    b, f, _, h, w = batch.videos.shape
    params = init_midas(cfg, f, (h, w), jax.random.PRNGKey(0))
    out = jax.jit(lambda p: apply_midas(cfg, p, batch, flows))(params)

    from flowmap_tpu.model.backbone.midas_net import MidasSmall
    from flowmap_tpu.ops.geometry import earlier, later, sample_image_grid
    from flowmap_tpu.ops.grid_sample import grid_sample_2d
    from flowmap_tpu.ops.resize import resize_bilinear

    @jax.jit
    def reference(params):
        videos = batch.videos.reshape(b * f, 3, h, w)
        head, feats = MidasSmall.apply_split(
            params["midas"], videos, mapping="exp"
        )
        feats = resize_bilinear(feats, (h, w)) / 20.0
        feats = feats.reshape(b, f, -1, h, w)
        xy, _ = sample_image_grid((h, w))
        grid = (xy + flows.backward) * 2 - 1
        c = feats.shape[2]
        warped = grid_sample_2d(
            earlier(feats).reshape(b * (f - 1), c, h, w),
            grid.reshape(b * (f - 1), h, w, 2),
            padding_mode="zeros",
        )
        cat = jnp.concatenate(
            [warped.reshape(b, f - 1, c, h, w), later(feats)], axis=2
        )
        cat = jnp.moveaxis(cat, 2, -1)
        logits = _apply_weight_mlp(params["corr_weighter"], cat)
        depths = jnp.exp(head.astype(jnp.float32) / 1000.0) + 0.01
        return depths.reshape(b, f, h, w), jnp.clip(
            jax.nn.sigmoid(logits)[..., 0], min=1e-4
        )

    depths_ref, weights_ref = reference(params)
    assert jnp.max(jnp.abs(out.depths - depths_ref)) < 1e-5
    # Tolerance: the layer-0 split is exact up to reassociation (~1e-7
    # relative); 3 subsequent dense layers amplify that before the sigmoid.
    assert jnp.max(jnp.abs(out.weights - weights_ref)) < 5e-3


def test_midas_shapes_and_finiteness(scene):
    batch, flows, _ = scene
    cfg = BackboneMidasCfg(pretrained=False, mapping="exp", warp_impl="gather")
    b, f, _, h, w = batch.videos.shape
    params = init_midas(cfg, f, (h, w), jax.random.PRNGKey(0))
    out = jax.jit(lambda p: apply_midas(cfg, p, batch, flows))(params)
    assert out.depths.shape == (b, f, h, w)
    assert out.weights.shape == (b, f - 1, h, w)
    assert bool(jnp.all(jnp.isfinite(out.depths)))
    assert bool(jnp.all(out.weights >= 1e-4))


def test_fused_corr_weights_path_matches_gather():
    """warp_impl="fused" (one Pallas pass from native-res features; interpret
    mode on CPU) must match the unfused gather path: same depths, same
    weights, same feature/MLP gradients.

    Uses a 10-frame scene whose vertical inter-frame flow (~3.6 px) fits the
    radius-5 warp window — the window-clamped paths are exact only under
    that condition, which `_autosize_warp_radius` guarantees in production.
    """
    import numpy as np
    from jax.experimental import pallas as pl

    import flowmap_tpu.ops.pallas.corr_weights as cw

    batch, flows, _ = make_scene(
        SyntheticSceneCfg(num_frames=10, image_shape=(64, 96))
    )
    b, f, _, h, w = batch.videos.shape
    fused_cfg = BackboneMidasCfg(
        pretrained=False,
        mapping="exp",
        warp_impl="fused",
        compute_dtype="float32",
        warp_radius=5,
        weights_resolution="full",
    )
    gather_cfg = BackboneMidasCfg(
        pretrained=False,
        mapping="exp",
        warp_impl="gather",
        compute_dtype="float32",
        warp_radius=5,
        weights_resolution="full",
    )
    params = init_midas(fused_cfg, f, (h, w), jax.random.PRNGKey(0))

    orig_call = pl.pallas_call
    orig_on_tpu = cw._on_tpu
    try:
        pl.pallas_call = lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
        cw._on_tpu = lambda: True

        def loss_fused(p):
            out = apply_midas(fused_cfg, p, batch, flows)
            return jnp.sum(out.weights**2), out

        (lf, out_fused), grads_fused = jax.value_and_grad(
            loss_fused, has_aux=True
        )(params)
    finally:
        pl.pallas_call = orig_call
        cw._on_tpu = orig_on_tpu

    def loss_gather(p):
        out = apply_midas(gather_cfg, p, batch, flows)
        return jnp.sum(out.weights**2), out

    (lg, out_gather), grads_gather = jax.value_and_grad(
        loss_gather, has_aux=True
    )(params)

    np.testing.assert_allclose(
        np.asarray(out_fused.depths), np.asarray(out_gather.depths), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.weights), np.asarray(out_gather.weights), atol=2e-5
    )
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5)
    # Compare the weight-MLP gradients (well-conditioned). Encoder-param
    # gradients are NOT compared: they backprop through ~50 layers of
    # batch-stat BN + ReLU, where ~1e-7 forward reassociation noise flips
    # ReLU subgradients and produces O(1) element diffs in either direction
    # — the fused path's feature cotangent itself is verified exactly at
    # kernel level (tests/test_corr_weights.py::test_gradients_match_oracle).
    for a, g in zip(
        jax.tree_util.tree_leaves(grads_fused["corr_weighter"]),
        jax.tree_util.tree_leaves(grads_gather["corr_weighter"]),
    ):
        a, g = np.asarray(a), np.asarray(g)
        scale = max(np.abs(g).max(), 1.0)
        np.testing.assert_allclose(a, g, atol=1e-4 * scale, rtol=1e-3)


def test_native_resolution_weights_close_to_full():
    """weights_resolution="native" (the TPU-first default: warp + MLP at the
    feature grid's own half resolution, upsample the scalar weight map) must
    produce a weight field close to the reference full-res formulation — the
    full-res features are themselves a bilinear blend of the native ones, so
    the two fields differ only by the MLP's nonlinearity between grid
    points — and must propagate gradients to features and MLP."""
    import numpy as np

    batch, flows, _ = make_scene(
        SyntheticSceneCfg(num_frames=10, image_shape=(64, 96))
    )
    b, f, _, h, w = batch.videos.shape
    kw = dict(
        pretrained=False,
        mapping="exp",
        warp_impl="gather",
        compute_dtype="float32",
        warp_radius=6,
    )
    native_cfg = BackboneMidasCfg(weights_resolution="native", **kw)
    full_cfg = BackboneMidasCfg(weights_resolution="full", **kw)
    params = init_midas(native_cfg, f, (h, w), jax.random.PRNGKey(0))

    out_native = jax.jit(lambda p: apply_midas(native_cfg, p, batch, flows))(
        params
    )
    out_full = jax.jit(lambda p: apply_midas(full_cfg, p, batch, flows))(params)

    assert out_native.weights.shape == (b, f - 1, h, w)
    np.testing.assert_allclose(
        np.asarray(out_native.depths), np.asarray(out_full.depths), atol=1e-5
    )
    wn_, wf_ = np.asarray(out_native.weights), np.asarray(out_full.weights)
    assert np.all(wn_ >= 1e-4) and np.all(wn_ <= 1.0)
    # Interior agreement (borders differ by design: zero-padded warp taps
    # enter at half-res granularity).
    interior = (slice(None), slice(None), slice(4, -4), slice(4, -4))
    diff = np.abs(wn_[interior] - wf_[interior])
    assert np.mean(diff) < 0.03, np.mean(diff)
    assert np.quantile(diff, 0.99) < 0.2, np.quantile(diff, 0.99)

    grads = jax.grad(
        lambda p: jnp.sum(apply_midas(native_cfg, p, batch, flows).weights ** 2)
    )(params)
    gnorms = [
        float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)
    ]
    assert any(g > 0 for g in gnorms)
    assert all(np.isfinite(g) for g in gnorms)
