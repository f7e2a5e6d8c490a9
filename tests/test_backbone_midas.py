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
