"""Instrumented flagship convergence run (TPU). args: [lr] [steps]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

lr = float(sys.argv[1]) if len(sys.argv) > 1 else 2e-4
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (BackboneMidasCfg, ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg, ModelCfg, RegressionCfg)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training import OverfitTrainerCfg, eval_forward, run_overfit
from flowmap_tpu.utils.ate import camera_centers, compute_ate
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_track_segments

batch, flows, gt_depths = make_scene(SyntheticSceneCfg(num_frames=12, image_shape=(64, 96)))
tracks = pack_tracks(make_track_segments(batch, gt_depths, interval=3, radius=4, grid_size=8), 12)
model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp", warp_impl="gather"),
    intrinsics=IntrinsicsSoftminCfg(num_procrustes_points=1024, num_candidates=30,
        regression=RegressionCfg(after_step=steps * 5 // 8, window=50)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=512),
)
trainer_cfg = OverfitTrainerCfg(lr=lr, max_steps=steps, val_check_interval=max(steps // 8, 1))

def on_val(state, step, metrics):
    out = eval_forward(model_cfg, state, batch, flows)
    ate, _, _ = compute_ate(camera_centers(np.asarray(batch.extrinsics[0])),
                            camera_centers(np.asarray(out.extrinsics[0])))
    print(f"step {step}: loss={metrics['loss/total']:.5f} ate={ate:.5f}", flush=True)

t0 = time.time()
state, info = run_overfit(model_cfg, [LossFlowCfg(), LossTrackingCfg(enable_after=50)],
                          trainer_cfg, batch, flows, tracks, on_validation=on_val)
h = info["history"]["loss/total"]
print(f"loss[0]={h[0]:.5f} loss[-1]={h[-1]:.5f} ratio={h[-1]/h[0]:.4f} time={time.time()-t0:.0f}s")
