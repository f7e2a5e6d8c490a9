"""Capture a device trace of the bench step and print per-HLO time ranking.

Usage: probe_profile.py [outdir]
"""
import glob
import gzip
import os
import sys
import time

import jax
import jax.numpy as jnp

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
OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flowmap_trace"

batch, flows, gt_depths = make_scene(
    SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE)
)
tracks = pack_tracks(
    make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35),
    NUM_FRAMES,
)
model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
    intrinsics=IntrinsicsSoftminCfg(
        regression=RegressionCfg(after_step=1000, window=100)
    ),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
model_cfg = _autosize_warp_radius(model_cfg, flows, IMAGE_SHAPE[0])
loss_cfgs = [LossFlowCfg(), LossTrackingCfg()]
trainer_cfg = OverfitTrainerCfg(lr=3e-5, max_steps=2000)
state, optimizer = init_train_state(model_cfg, trainer_cfg, NUM_FRAMES, IMAGE_SHAPE)
step = jax.jit(
    make_train_step(model_cfg, loss_cfgs, optimizer, jax.random.PRNGKey(0)),
    donate_argnums=(0,),
)

# warm up / compile
for _ in range(3):
    state, metrics = step(state, batch, flows, tracks)
_ = float(metrics["loss/total"])
print("# warmed", flush=True)

jax.profiler.start_trace(OUTDIR)
for _ in range(5):
    state, metrics = step(state, batch, flows, tracks)
_ = float(metrics["loss/total"])
jax.profiler.stop_trace()
print("# traced", flush=True)

# ---- parse the xplane and rank HLO ops by self time -----------------------
xspaces = sorted(glob.glob(os.path.join(OUTDIR, "**", "*.xplane.pb"), recursive=True))
print("xplane files:", xspaces, flush=True)
if not xspaces:
    sys.exit(0)

from xprof.convert import raw_to_tool_data as rd

params = {"tqx": "out:csv;"}
try:
    data, _ = rd.xspace_to_tool_data(xspaces, "framework_op_stats", params)
    out = data.decode() if isinstance(data, bytes) else str(data)
    open("/tmp/op_stats.csv", "w").write(out)
    lines = out.splitlines()
    print("\n".join(lines[:40]))
except Exception as e:
    print("framework_op_stats failed:", e)
    for tool in ("hlo_stats", "op_profile", "overview_page"):
        try:
            data, _ = rd.xspace_to_tool_data(xspaces, tool, params)
            out = data.decode() if isinstance(data, bytes) else str(data)
            open(f"/tmp/{tool}.out", "w").write(out)
            print(f"# wrote /tmp/{tool}.out ({len(out)} bytes)")
        except Exception as e2:
            print(f"{tool} failed:", e2)
