"""Capture a jax.profiler trace of the full train step at reference scale.

Writes to /tmp/jax_trace; inspect with scripts/probes/summarize_trace.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneMidasCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    _autosize_warp_radius,
    init_train_state,
    make_train_step,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_track_segments
from flowmap_tpu.tracking import pack_tracks

NUM_FRAMES, IMAGE_SHAPE = 150, (160, 224)
batch, flows, gt_depths = make_scene(
    SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE)
)
tracks = pack_tracks(
    make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35),
    NUM_FRAMES,
)

model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp", bn="folded"),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
model_cfg = _autosize_warp_radius(model_cfg, flows, IMAGE_SHAPE[0])
loss_cfgs = [LossFlowCfg(), LossTrackingCfg()]
trainer_cfg = OverfitTrainerCfg(lr=3e-5)
state, optimizer = init_train_state(model_cfg, trainer_cfg, NUM_FRAMES, IMAGE_SHAPE)
step = jax.jit(
    make_train_step(model_cfg, loss_cfgs, optimizer, jax.random.PRNGKey(0), staged_vjp=False),
    donate_argnums=(0,),
)

for i in range(3):
    state, metrics = step(state, batch, flows, tracks)
print("warm, loss", float(metrics["loss/total"]), flush=True)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
with jax.profiler.trace(out):
    for i in range(3):
        state, metrics = step(state, batch, flows, tracks)
    float(metrics["loss/total"])
print("trace written to", out, flush=True)
