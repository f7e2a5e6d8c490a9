"""Component timing decomposition at a given scale (serialized TPU use).

Runs steady-state steps for several model-config variants and prints steps/s,
so per-component cost = difference between variants.
"""
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

F = int(sys.argv[1]) if len(sys.argv) > 1 else 50
H = int(sys.argv[2]) if len(sys.argv) > 2 else 160
W = int(sys.argv[3]) if len(sys.argv) > 3 else 224
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 10

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneExplicitDepthCfg,
    BackboneMidasCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsRegressedCfg,
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

batch, flows, depths = make_scene(SyntheticSceneCfg(num_frames=F, image_shape=(H, W)))
packed = pack_tracks(make_track_segments(batch, depths, 5, 20, 35), F)

MIDAS = BackboneMidasCfg(pretrained=False, mapping="exp")
EXPL = BackboneExplicitDepthCfg(initial_depth=1.0)
SOFTMIN = IntrinsicsSoftminCfg(regression=RegressionCfg())
REGR = IntrinsicsRegressedCfg()
PROC = ExtrinsicsProcrustesCfg(num_points=1000)


def run(name, backbone, intrinsics, tracks):
    from flowmap_tpu.training.overfit import _autosize_warp_radius

    mc = ModelCfg(backbone=backbone, intrinsics=intrinsics, extrinsics=PROC)
    mc = _autosize_warp_radius(mc, flows, H)
    loss_cfgs = [LossFlowCfg()] + ([LossTrackingCfg()] if tracks is not None else [])
    state, opt = init_train_state(mc, OverfitTrainerCfg(), F, (H, W))
    step = jax.jit(make_train_step(mc, loss_cfgs, opt, jax.random.PRNGKey(0)))
    t0 = time.time()
    state, metrics = step(state, batch, flows, tracks)
    jax.block_until_ready(metrics["loss/total"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = step(state, batch, flows, tracks)
    jax.block_until_ready(metrics["loss/total"])
    dt = time.time() - t0
    print(
        f"{name}: compile={compile_s:.1f}s {STEPS/dt:.2f} steps/s "
        f"({dt/STEPS*1000:.1f} ms/step)",
        flush=True,
    )


print(f"decomposition at F={F} {H}x{W}", flush=True)
run("full (midas+softmin+tracks)", MIDAS, SOFTMIN, packed)
run("-tracks", MIDAS, SOFTMIN, None)
run("-softmin (regressed)", MIDAS, REGR, None)
run("-midas (explicit)", EXPL, REGR, None)
run("explicit+softmin+tracks", EXPL, SOFTMIN, packed)
print("DECOMP DONE", flush=True)
