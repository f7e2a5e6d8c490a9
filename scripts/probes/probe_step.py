"""Probe: full single-jit train step at reference scale on TPU.

Usage: probe_step.py [staged|mono] [radius]
"""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

mode = sys.argv[1] if len(sys.argv) > 1 else "staged"
radius = int(sys.argv[2]) if len(sys.argv) > 2 else 3
radius_x = int(sys.argv[3]) if len(sys.argv) > 3 else radius

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneMidasCfg, ExtrinsicsProcrustesCfg, IntrinsicsSoftminCfg, ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg, init_train_state, make_train_step,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_track_segments
from flowmap_tpu.tracking import pack_tracks

NUM_FRAMES, IMAGE_SHAPE = 150, (160, 224)
batch, flows, gt_depths = make_scene(SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE))
tracks = pack_tracks(make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35), NUM_FRAMES)

model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(
        pretrained=False, mapping="exp", warp_radius=radius, warp_radius_x=radius_x
    ),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
loss_cfgs = [LossFlowCfg(), LossTrackingCfg()]
trainer_cfg = OverfitTrainerCfg(lr=3e-5)
state, optimizer = init_train_state(model_cfg, trainer_cfg, NUM_FRAMES, IMAGE_SHAPE)
step = jax.jit(make_train_step(
    model_cfg, loss_cfgs, optimizer, jax.random.PRNGKey(0),
    staged_vjp=(mode == "staged"),
), donate_argnums=(0,))

t0 = time.time()
state, metrics = step(state, batch, flows, tracks)
jax.block_until_ready(metrics["loss/total"])
print(f"[{mode} r{radius},{radius_x}] compile+first: {time.time()-t0:.1f}s loss={float(metrics['loss/total']):.4f}", flush=True)
for i in range(3):
    t0 = time.time()
    state, metrics = step(state, batch, flows, tracks)
    jax.block_until_ready(metrics["loss/total"])
    print(f"iter {i}: {(time.time()-t0)*1000:.1f} ms loss={float(metrics['loss/total']):.4f}", flush=True)
# Pipelined block (bench methodology): no per-step host sync.
for _ in range(2):
    t0 = time.time()
    for _ in range(25):
        state, metrics = step(state, batch, flows, tracks)
    jax.block_until_ready(metrics["loss/total"])
    print(f"pipelined: {(time.time()-t0)*1000/25:.1f} ms/step", flush=True)
print("OK")
