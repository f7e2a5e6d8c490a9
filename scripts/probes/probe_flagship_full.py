"""Full-scale flagship convergence: reference scale, 2000 steps, on TPU.
Produces the convergence curve recorded in BASELINE.md."""
import sys; sys.path.insert(0, "/root/repo")
import sys, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (BackboneMidasCfg, ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg, ModelCfg, RegressionCfg)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training import OverfitTrainerCfg, eval_forward, run_overfit
from flowmap_tpu.utils.ate import camera_centers, compute_ate
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_track_segments

batch, flows, gt_depths = make_scene(SyntheticSceneCfg(num_frames=150, image_shape=(160, 224)))
tracks_raw = make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35)
model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
trainer_cfg = OverfitTrainerCfg(lr=3e-5, max_steps=2000, val_check_interval=100)

def on_val(state, step, metrics):
    out = eval_forward(model_cfg, state, batch, flows)
    ate, _, _ = compute_ate(camera_centers(np.asarray(batch.extrinsics[0])),
                            camera_centers(np.asarray(out.extrinsics[0])))
    fx = metrics.get("intrinsics/fx_error", float("nan"))
    print(f"step {step}: loss={metrics['loss/total']:.5f} ate={ate:.5f} fx_err={fx:.4f}", flush=True)

t0 = time.time()
state, info = run_overfit(model_cfg, [LossFlowCfg(), LossTrackingCfg()],
                          trainer_cfg, batch, flows, tracks_raw, on_validation=on_val)
h = info["history"]["loss/total"]
print(f"DONE loss[0]={h[0]:.5f} loss[-1]={h[-1]:.5f} ratio={h[-1]/h[0]:.5f} time={time.time()-t0:.0f}s", flush=True)
