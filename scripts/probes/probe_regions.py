"""Time each region of the train step at reference scale on TPU.

Usage: probe_regions.py [radius]
"""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

radius = int(sys.argv[1]) if len(sys.argv) > 1 else 3

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.loss.loss import compute_losses
from flowmap_tpu.model import (
    BackboneMidasCfg, ExtrinsicsProcrustesCfg, IntrinsicsSoftminCfg, ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.model.backbone import apply_backbone
from flowmap_tpu.model.extrinsics import apply_extrinsics
from flowmap_tpu.model.intrinsics import apply_intrinsics
from flowmap_tpu.ops.geometry import sample_image_grid, unproject
from flowmap_tpu.training.overfit import OverfitTrainerCfg, init_train_state
from flowmap_tpu.types import ModelOutput
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_track_segments
from flowmap_tpu.tracking import pack_tracks

NUM_FRAMES, IMAGE_SHAPE = 150, (160, 224)
H, W = IMAGE_SHAPE
batch, flows, gt_depths = make_scene(SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE))
tracks = pack_tracks(make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35), NUM_FRAMES)

model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp", warp_radius=radius),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
loss_cfgs = [LossFlowCfg(), LossTrackingCfg()]
state, optimizer = init_train_state(model_cfg, OverfitTrainerCfg(), NUM_FRAMES, IMAGE_SHAPE)
params, mstate = state.params, state.model_state
step0 = jnp.asarray(0, jnp.int32)
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.time(); out = fn(*args); jax.block_until_ready(out); ts.append(time.time() - t0)
    print(f"{name:32s} {min(ts)*1000:8.1f} ms", flush=True)
    return out

# --- forwards
bo = timeit("backbone fwd", jax.jit(lambda p: apply_backbone(model_cfg.backbone, p["backbone"], batch, flows)), params)
kfn = jax.jit(lambda p, b: apply_intrinsics(model_cfg.intrinsics, p["intrinsics"], mstate.intrinsics, batch, flows, b, step0, k1, train=True)[0])
kmat = timeit("softmin sweep fwd", kfn, params, bo)
def surf(b, kk):
    xy, _ = sample_image_grid((H, W), dtype=jnp.float32)
    return unproject(xy, b.depths, kk[:, :, None, None])
surfaces = timeit("unproject fwd", jax.jit(surf), bo, kmat)
efn = jax.jit(lambda p, b, s: apply_extrinsics(model_cfg.extrinsics, p["extrinsics"], batch, flows, b, s, k2))
t = timeit("extrinsics fwd", efn, params, bo, surfaces)
def loss_fn_all(b, s, kk, tt):
    out = ModelOutput(depths=b.depths, surfaces=s, intrinsics=kk, extrinsics=tt,
                      backward_correspondence_weights=b.weights)
    total, _ = compute_losses(loss_cfgs, flows, tracks, out, step0, (H, W))
    return total
timeit("losses fwd", jax.jit(loss_fn_all), bo, surfaces, kmat, t)

# --- fwd+bwd of regions
timeit("backbone fwd+bwd", jax.jit(jax.grad(lambda p: jnp.sum(apply_backbone(model_cfg.backbone, p["backbone"], batch, flows).depths ** 2) + jnp.sum(apply_backbone(model_cfg.backbone, p["backbone"], batch, flows).weights ** 2))), params)
timeit("sweep fwd+bwd", jax.jit(jax.grad(lambda p: jnp.sum(kfn(p, bo) ** 2))), params)
timeit("extr fwd+bwd(surf)", jax.jit(jax.grad(lambda s: jnp.sum(efn(params, bo, s) ** 2))), surfaces)
timeit("losses fwd+bwd", jax.jit(jax.grad(loss_fn_all, argnums=(1, 2, 3)), ), bo, surfaces, kmat, t)
print("done")
