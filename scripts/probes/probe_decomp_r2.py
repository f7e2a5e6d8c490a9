"""Full-step ablation decomposition at reference scale on the real chip.

Times the exact bench step under component ablations; differences against the
full step attribute wall-clock to regions without isolated-probe compile
pathologies. Usage: probe_decomp_r2.py [variant ...] (default: all).
"""
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
    IntrinsicsGroundTruthCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.model.backbone.backbone_explicit_depth import BackboneExplicitDepthCfg
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


import dataclasses


def bench_cfg(**kw):
    return ModelCfg(
        backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
        intrinsics=IntrinsicsSoftminCfg(
            regression=RegressionCfg(after_step=1000, window=100)
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
        **kw,
    )




VARIANTS = {
    "full": (bench_cfg(), [LossFlowCfg(), LossTrackingCfg()], True),
    "pallas_warp": (
        dataclasses.replace(
            bench_cfg(),
            backbone=BackboneMidasCfg(
                pretrained=False, mapping="exp", warp_impl="pallas"
            ),
        ),
        [LossFlowCfg(), LossTrackingCfg()],
        True,
    ),
    "mono": (bench_cfg(), [LossFlowCfg(), LossTrackingCfg()], False),
    "no_track": (bench_cfg(), [LossFlowCfg()], True),
    "no_flowloss": (bench_cfg(), [LossTrackingCfg()], True),
    "no_weights": (
        bench_cfg(use_correspondence_weights=False),
        [LossFlowCfg(), LossTrackingCfg()],
        True,
    ),
    "gt_intrinsics": (
        dataclasses.replace(bench_cfg(), intrinsics=IntrinsicsGroundTruthCfg()),
        [LossFlowCfg(), LossTrackingCfg()],
        True,
    ),
    "explicit_depth": (
        dataclasses.replace(
            bench_cfg(),
            backbone=BackboneExplicitDepthCfg(),
        ),
        [LossFlowCfg(), LossTrackingCfg()],
        True,
    ),
    "folded_bn": (
        dataclasses.replace(
            bench_cfg(),
            backbone=BackboneMidasCfg(pretrained=False, mapping="exp", bn="folded"),
        ),
        [LossFlowCfg(), LossTrackingCfg()],
        True,
    ),
    "f32_net": (
        dataclasses.replace(
            bench_cfg(),
            backbone=BackboneMidasCfg(
                pretrained=False, mapping="exp", compute_dtype="float32"
            ),
        ),
        [LossFlowCfg(), LossTrackingCfg()],
        True,
    ),
}

names = sys.argv[1:] or list(VARIANTS)
for name in names:
    model_cfg, loss_cfgs, staged = VARIANTS[name]
    model_cfg = _autosize_warp_radius(model_cfg, flows, IMAGE_SHAPE[0])
    trainer_cfg = OverfitTrainerCfg(lr=3e-5, max_steps=2000)
    state, optimizer = init_train_state(model_cfg, trainer_cfg, NUM_FRAMES, IMAGE_SHAPE)
    step = jax.jit(
        make_train_step(
            model_cfg, loss_cfgs, optimizer, jax.random.PRNGKey(0), staged_vjp=staged
        ),
        donate_argnums=(0,),
    )
    t0 = time.time()
    state, metrics = step(state, batch, flows, tracks)
    _ = float(metrics["loss/total"])
    compile_s = time.time() - t0
    # steady state
    n = 20
    t0 = time.time()
    for _ in range(n):
        state, metrics = step(state, batch, flows, tracks)
    _ = float(metrics["loss/total"])
    ms = (time.time() - t0) / n * 1000
    print(f"{name:16s} {ms:8.1f} ms/step   (compile+first {compile_s:.1f}s)", flush=True)
