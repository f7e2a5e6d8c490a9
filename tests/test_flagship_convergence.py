"""Flagship-config convergence: random-init MiDaS + softmin intrinsics +
Procrustes extrinsics + flow & tracking losses on an exact-flow synthetic
scene must drive the loss down sharply and ATE toward zero.

This is the miniature of the benchmarked configuration (VERDICT round 1,
item 3): same component stack as `bench.py`/the default CLI, reduced in
scale so it runs on CPU in CI. Reference behavior:
`flowmap/model/model_wrapper_overfit.py:51-73` + `+experiment=ablation_random_initialization`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneMidasCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training import OverfitTrainerCfg, eval_forward, run_overfit
from flowmap_tpu.utils.ate import camera_centers, compute_ate
from flowmap_tpu.utils.synthetic import (
    SyntheticSceneCfg,
    make_scene,
    make_track_segments,
)


@pytest.mark.slow
def test_flagship_converges():
    batch, flows, gt_depths = make_scene(
        SyntheticSceneCfg(num_frames=10, image_shape=(64, 64))
    )
    tracks = pack_tracks(
        make_track_segments(batch, gt_depths, interval=3, radius=4, grid_size=8),
        10,
    )
    model_cfg = ModelCfg(
        backbone=BackboneMidasCfg(
            pretrained=False, mapping="exp", warp_impl="gather"
        ),
        intrinsics=IntrinsicsSoftminCfg(
            num_procrustes_points=512,
            num_candidates=20,
            regression=RegressionCfg(after_step=200, window=50),
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=512),
    )
    trainer_cfg = OverfitTrainerCfg(
        lr=1e-3, max_steps=400, val_check_interval=25
    )
    state, info = run_overfit(
        model_cfg,
        [LossFlowCfg(), LossTrackingCfg(enable_after=50)],
        trainer_cfg,
        batch,
        flows,
        tracks,
    )

    # The exp(head/1000) random-init depth mapping compresses depth
    # gradients 1000x, so the mini scene needs lr 1e-3 over 400 steps to
    # descend decisively (sweep: /tmp-era round-2 notes; lr 1e-3 reaches
    # loss 1.09 -> 0.52 and ATE 0.052, lr 3e-4 needs 600 steps for the
    # same). The binding assertion is ATE below; the loss ratios are a
    # backstop against divergence. The full >=10x decrease at reference
    # scale is recorded in BASELINE.md from scripts/probes/probe_flagship_full.py.
    history = info["history"]["loss/total"]
    assert history[-1] < history[0] * 0.65, history
    assert min(history) < history[0] * 0.6, history

    out = eval_forward(model_cfg, state, batch, flows)
    assert bool(jnp.all(jnp.isfinite(out.extrinsics)))
    ate, _, _ = compute_ate(
        camera_centers(np.asarray(batch.extrinsics[0])),
        camera_centers(np.asarray(out.extrinsics[0])),
    )
    assert ate < 0.1, f"flagship ATE did not converge: {ate}"
