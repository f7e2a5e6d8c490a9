"""Softmin intrinsics state-machine tests (SURVEY.md §7.3 hard part #3)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmap_tpu.model.backbone.backbone_explicit_depth import (
    BackboneExplicitDepthCfg,
    apply_explicit_depth,
    init_explicit_depth,
)
from flowmap_tpu.model.intrinsics.intrinsics import (
    IntrinsicsRegressedCfg,
    IntrinsicsSoftminCfg,
    RegressionCfg,
    apply_intrinsics,
    init_intrinsics,
    init_intrinsics_state,
    maybe_handoff_focal,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def _setup(after_step=20, window=8):
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=4, image_shape=(24, 32))
    )
    bb_cfg = BackboneExplicitDepthCfg(initial_depth=1.0)
    bb_params = init_explicit_depth(bb_cfg, 4, (24, 32))
    backbone_out = apply_explicit_depth(bb_cfg, bb_params, batch, flows)
    cfg = IntrinsicsSoftminCfg(
        num_procrustes_points=128,
        num_candidates=8,
        regression=RegressionCfg(after_step=after_step, window=window),
    )
    return cfg, batch, flows, backbone_out


def test_window_fills_only_in_range():
    cfg, batch, flows, backbone_out = _setup(after_step=20, window=8)
    params = init_intrinsics(cfg)
    state = init_intrinsics_state(cfg)
    key = jax.random.PRNGKey(0)

    # Before the window range: untouched (zeros).
    _, state = apply_intrinsics(
        cfg, params, state, batch, flows, backbone_out, jnp.asarray(3), key
    )
    assert float(jnp.abs(state.focal_window).sum()) == 0.0

    # Steps 12..19 fill slots 12%8..19%8 = each exactly once.
    for step in range(12, 20):
        _, state = apply_intrinsics(
            cfg, params, state, batch, flows, backbone_out, jnp.asarray(step), key
        )
    window = np.asarray(state.focal_window)
    assert np.all(window > 0), window
    # All entries are plausible focal estimates within the candidate range.
    assert np.all((window >= 0.5) & (window <= 2.0))


def test_handoff_at_boundary():
    cfg, batch, flows, backbone_out = _setup(after_step=20, window=8)
    params = init_intrinsics(cfg)
    state = init_intrinsics_state(cfg)
    key = jax.random.PRNGKey(0)
    for step in range(12, 20):
        _, state = apply_intrinsics(
            cfg, params, state, batch, flows, backbone_out, jnp.asarray(step), key
        )
    assert float(params["focal_length"]) == 0.0
    handed = maybe_handoff_focal(cfg, params, state, jnp.asarray(20))
    expected = float(jnp.mean(state.focal_window))
    np.testing.assert_allclose(float(handed["focal_length"]), expected, rtol=1e-6)
    # No handoff at other steps.
    same = maybe_handoff_focal(cfg, params, state, jnp.asarray(19))
    assert float(same["focal_length"]) == 0.0


def test_stage2_uses_regressed_focal():
    cfg, batch, flows, backbone_out = _setup(after_step=20, window=8)
    params = {"focal_length": jnp.asarray(1.23)}
    state = init_intrinsics_state(cfg)
    k, _ = jax.random.split(jax.random.PRNGKey(0))
    intr, _ = apply_intrinsics(
        cfg, params, state, batch, flows, backbone_out, jnp.asarray(25), k
    )
    h, w = 24, 32
    scale = (h * w) ** 0.5
    np.testing.assert_allclose(
        float(intr[0, 0, 0, 0]), 1.23 * scale / w, rtol=1e-5
    )


def test_regressed_cfg():
    cfg = IntrinsicsRegressedCfg(initial_focal_length=0.85)
    params = init_intrinsics(cfg)
    np.testing.assert_allclose(float(params["focal_length"]), 0.85)
