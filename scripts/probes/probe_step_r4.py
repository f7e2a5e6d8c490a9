"""A/B the full train step at reference scale: bn mode x vjp structure.

`bn="folded"` is the graph the shipped pretrained path runs (checkpoint
conversion folds BN — utils/torch_convert.py); `bn="batch"` is the
random-init ablation graph. staged_vjp toggles the optimization_barrier
chain vs the monolithic backward.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneMidasCfg, ExtrinsicsProcrustesCfg, IntrinsicsSoftminCfg,
    ModelCfg, RegressionCfg,
)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg, _autosize_warp_radius, init_train_state, make_train_step,
)
from flowmap_tpu.utils.synthetic import (
    SyntheticSceneCfg, make_scene, make_track_segments,
)

NUM_FRAMES, IMAGE_SHAPE = 150, (160, 224)
batch, flows, gt_depths = make_scene(
    SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE)
)
tracks = pack_tracks(
    make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35),
    NUM_FRAMES,
)
loss_cfgs = [LossFlowCfg(), LossTrackingCfg()]
trainer_cfg = OverfitTrainerCfg(lr=3e-5, max_steps=2000)

for bn in ("folded",):
    for staged in (False,):
        model_cfg = ModelCfg(
            backbone=BackboneMidasCfg(pretrained=False, mapping="exp", bn=bn),
            intrinsics=IntrinsicsSoftminCfg(
                regression=RegressionCfg(after_step=1000, window=100)
            ),
            extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
        )
        model_cfg = _autosize_warp_radius(model_cfg, flows, IMAGE_SHAPE[0])
        state, optimizer = init_train_state(
            model_cfg, trainer_cfg, NUM_FRAMES, IMAGE_SHAPE
        )
        step = jax.jit(
            make_train_step(
                model_cfg, loss_cfgs, optimizer, jax.random.PRNGKey(0),
                staged_vjp=staged,
            ),
            donate_argnums=(0,),
        )
        t0 = time.time()
        for i in range(10):
            state, metrics = step(state, batch, flows, tracks)
        float(metrics["loss/total"])
        warm = time.time() - t0
        t0 = time.time()
        n = 30
        for i in range(n):
            state, metrics = step(state, batch, flows, tracks)
        float(metrics["loss/total"])
        dt = (time.time() - t0) / n * 1000
        print(
            f"bn={bn:7s} staged={staged}  {dt:7.2f} ms/step "
            f"(warm+compile {warm:.0f}s)  loss={float(metrics['loss/total']):.4f}",
            flush=True,
        )
print("done")
