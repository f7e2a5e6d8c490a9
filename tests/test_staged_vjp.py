"""Staged VJP (three chained backward regions) == monolithic value_and_grad.

The staged path (training/overfit.py:_staged_value_and_grad) is a pure
chain-rule decomposition; gradients and metrics must match the single
jax.value_and_grad step bit-for-bit (same ops, same order within each
region) up to float addition reordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneExplicitDepthCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    init_train_state,
    make_train_step,
)
from flowmap_tpu.utils.synthetic import (
    SyntheticSceneCfg,
    make_scene,
    make_track_segments,
)


def test_staged_matches_monolithic():
    num_frames, shape = 8, (32, 32)
    batch, flows, gt_depths = make_scene(
        SyntheticSceneCfg(num_frames=num_frames, image_shape=shape)
    )
    tracks = pack_tracks(
        make_track_segments(batch, gt_depths, interval=3, radius=3, grid_size=8),
        num_frames,
    )
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(),
        intrinsics=IntrinsicsSoftminCfg(
            num_candidates=12,
            num_procrustes_points=256,
            regression=RegressionCfg(after_step=10, window=4),
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=128),
    )
    loss_cfgs = [LossFlowCfg(), LossTrackingCfg(enable_after=0)]
    state, optimizer = init_train_state(
        model_cfg, OverfitTrainerCfg(), num_frames, shape
    )

    key = jax.random.PRNGKey(3)
    from flowmap_tpu.loss.loss import compute_losses
    from flowmap_tpu.model.model import forward
    from flowmap_tpu.training.overfit import _staged_value_and_grad

    h, w = shape
    fold = jax.random.fold_in(key, state.step)

    def loss_fn(p):
        output, _ = forward(
            model_cfg, p, state.model_state, batch, flows, state.step, fold,
            train=True,
        )
        total, _ = compute_losses(
            loss_cfgs, flows, tracks, output, state.step, (h, w)
        )
        return total

    total_mono, g_mono = jax.jit(jax.value_and_grad(loss_fn))(state.params)
    (total_staged, _), g_staged = jax.jit(
        lambda p: _staged_value_and_grad(
            model_cfg, loss_cfgs, p, state, batch, flows, tracks, fold
        )
    )(state.params)

    np.testing.assert_allclose(float(total_mono), float(total_staged), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_mono), jax.tree_util.tree_leaves(g_staged)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_dispatched_matches_monolithic():
    from flowmap_tpu.training.overfit import make_train_step_dispatched

    num_frames, shape = 8, (32, 32)
    batch, flows, gt_depths = make_scene(
        SyntheticSceneCfg(num_frames=num_frames, image_shape=shape)
    )
    tracks = pack_tracks(
        make_track_segments(batch, gt_depths, interval=3, radius=3, grid_size=8),
        num_frames,
    )
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(),
        intrinsics=IntrinsicsSoftminCfg(
            num_candidates=12,
            num_procrustes_points=256,
            regression=RegressionCfg(after_step=10, window=4),
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=128),
    )
    loss_cfgs = [LossFlowCfg(), LossTrackingCfg(enable_after=0)]
    state, optimizer = init_train_state(
        model_cfg, OverfitTrainerCfg(), num_frames, shape
    )
    key = jax.random.PRNGKey(3)

    step_mono = jax.jit(
        make_train_step(model_cfg, loss_cfgs, optimizer, key, staged_vjp=False)
    )
    step_disp = make_train_step_dispatched(model_cfg, loss_cfgs, optimizer, key)

    s_m, m_m = step_mono(state, batch, flows, tracks)
    s_d, m_d = step_disp(state, batch, flows, tracks)
    np.testing.assert_allclose(
        float(m_m["loss/total"]), float(m_d["loss/total"]), rtol=1e-6
    )
    # Second step exercises state threading (step counter, opt state, window).
    s_m2, m_m2 = step_mono(s_m, batch, flows, tracks)
    s_d2, m_d2 = step_disp(s_d, batch, flows, tracks)
    np.testing.assert_allclose(
        float(m_m2["loss/total"]), float(m_d2["loss/total"]), rtol=1e-5
    )
    assert int(s_d2.step) == 2
