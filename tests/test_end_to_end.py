"""End-to-end optimization on a synthetic rigid scene.

The flow supervision is exact (induced by GT depth/poses/intrinsics), so a
correct implementation must drive the pose error down sharply — this is the
integration test the reference lacks (SURVEY.md §4 'end-to-end fixture').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneExplicitDepthCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsGroundTruthCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.training import OverfitTrainerCfg, eval_forward, run_overfit
from flowmap_tpu.utils.ate import camera_centers, compute_ate
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_tracks


@pytest.fixture(scope="module")
def scene():
    return make_scene(SyntheticSceneCfg(num_frames=10, image_shape=(48, 64)))


def _final_ate(model_cfg, batch, flows, state):
    out = eval_forward(model_cfg, state, batch, flows)
    assert bool(jnp.all(jnp.isfinite(out.extrinsics)))
    ate, _, _ = compute_ate(
        camera_centers(np.asarray(batch.extrinsics[0])),
        camera_centers(np.asarray(out.extrinsics[0])),
    )
    return ate, out


def test_overfit_gt_intrinsics_converges(scene):
    batch, flows, _ = scene
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=500),
    )
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=300, val_check_interval=100)
    state, info = run_overfit(model_cfg, [LossFlowCfg()], trainer_cfg, batch, flows)
    ate, out = _final_ate(model_cfg, batch, flows, state)
    history = info["history"]["loss/total"]
    assert history[-1] < history[0] * 0.5, history
    assert ate < 0.05, f"ATE did not converge: {ate}"


def test_overfit_softmin_two_stage(scene):
    """Softmin intrinsics + regression handoff: loss must keep decreasing
    across the stage boundary and the focal must move toward GT."""
    batch, flows, _ = scene
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsSoftminCfg(
            num_procrustes_points=512,
            num_candidates=30,
            regression=RegressionCfg(after_step=150, window=50),
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=500),
    )
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=250, val_check_interval=50)
    state, info = run_overfit(model_cfg, [LossFlowCfg()], trainer_cfg, batch, flows)

    # Window must have been populated during stage 1.
    window = np.asarray(state.model_state.intrinsics.focal_window)
    assert np.all(window > 0), "focal window never filled"
    # After the boundary, the regressed focal must be live (handoff applied).
    focal = float(state.params["intrinsics"]["focal_length"])
    assert 0.5 <= focal <= 2.0, focal

    ate, out = _final_ate(model_cfg, batch, flows, state)
    assert ate < 0.2, f"ATE diverged: {ate}"
    assert bool(jnp.all(jnp.isfinite(out.intrinsics)))


def test_overfit_with_tracking_loss(scene):
    batch, flows, gt_depths = scene
    tracks = make_tracks(batch, gt_depths, num_points=32)
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=500),
    )
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=200, val_check_interval=100)
    state, info = run_overfit(
        model_cfg,
        [LossFlowCfg(), LossTrackingCfg(enable_after=50)],
        trainer_cfg,
        batch,
        flows,
        tracks,
    )
    assert "loss/tracking" in info["history"]
    # Tracking loss is gated off before step 50 and positive afterwards.
    assert info["history"]["loss/tracking"][-1] >= 0
    ate, _ = _final_ate(model_cfg, batch, flows, state)
    assert ate < 0.1, ate


def test_gradients_flow_to_depth(scene):
    """Pose estimation is not detached: depth gradients must be nonzero."""
    import optax

    from flowmap_tpu.training.overfit import init_train_state, make_train_step

    batch, flows, _ = scene
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=500),
    )
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=1)
    f, (h, w) = batch.videos.shape[1], batch.videos.shape[-2:]
    state, optimizer = init_train_state(model_cfg, trainer_cfg, f, (h, w))
    step = make_train_step(
        model_cfg, [LossFlowCfg()], optimizer, jax.random.PRNGKey(0)
    )
    new_state, metrics = step(state, batch, flows, None)
    delta = np.abs(
        np.asarray(new_state.params["backbone"]["depth"])
        - np.asarray(state.params["backbone"]["depth"])
    )
    assert delta.max() > 0, "no gradient reached the depth parameters"
    assert np.isfinite(metrics["loss/total"])
