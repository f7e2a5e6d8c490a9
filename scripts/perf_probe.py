"""Steady-state perf probe: compile + run the full train step at a given scale.

Usage: python scripts/perf_probe.py [frames] [h] [w] [steps] [tracks:0|1]
"""
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

F = int(sys.argv[1]) if len(sys.argv) > 1 else 20
H = int(sys.argv[2]) if len(sys.argv) > 2 else 96
W = int(sys.argv[3]) if len(sys.argv) > 3 else 128
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 10
TRACKS = int(sys.argv[5]) if len(sys.argv) > 5 else 1

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneMidasCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    init_train_state,
    make_train_chunk,
    make_train_step,
)
from flowmap_tpu.utils.synthetic import (
    SyntheticSceneCfg,
    make_scene,
    make_track_segments,
)

print(f"scale probe F={F} H={H} W={W} steps={STEPS} tracks={TRACKS}", flush=True)
t0 = time.time()
batch, flows, depths = make_scene(SyntheticSceneCfg(num_frames=F, image_shape=(H, W)))
tracks = (
    pack_tracks(make_track_segments(batch, depths, 5, 20, 35), F) if TRACKS else None
)
loss_cfgs = [LossFlowCfg()] + ([LossTrackingCfg()] if TRACKS else [])
print("setup:", time.time() - t0, flush=True)

mc = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg()),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
state, opt = init_train_state(mc, OverfitTrainerCfg(), F, (H, W))
step = make_train_step(mc, loss_cfgs, opt, jax.random.PRNGKey(0))
chunk = make_train_chunk(step, STEPS)

t0 = time.time()
state, metrics = chunk(state, batch, flows, tracks)
jax.block_until_ready(metrics["loss/total"])
print("compile+run:", time.time() - t0, flush=True)
t0 = time.time()
state, metrics = chunk(state, batch, flows, tracks)
jax.block_until_ready(metrics["loss/total"])
dt = time.time() - t0
print(
    f"steady: {dt:.3f}s for {STEPS} steps -> {STEPS/dt:.2f} steps/s, "
    f"loss={float(metrics['loss/total'][-1]):.5f}",
    flush=True,
)
