"""Decompose the losses region: flow vs tracking, fwd and fwd+bwd; cost analysis."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.loss.loss import loss_flow, loss_tracking
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene, make_track_segments
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.types import ModelOutput

NUM_FRAMES, IMAGE_SHAPE = 150, (160, 224)
H, W = IMAGE_SHAPE
batch, flows, gt_depths = make_scene(SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE))
tracks = pack_tracks(make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35), NUM_FRAMES)

key = jax.random.PRNGKey(0)
surfaces = jax.random.normal(key, (1, NUM_FRAMES, H, W, 3)) * 0.1 + jnp.array([0., 0., 2.])
extr = jnp.broadcast_to(jnp.eye(4), (1, NUM_FRAMES, 4, 4)) + 0.0
intr = jnp.broadcast_to(jnp.asarray([[1.2, 0, 0.5], [0, 1.7, 0.5], [0, 0, 1.]]), (1, NUM_FRAMES, 3, 3)) + 0.0
out = ModelOutput(depths=surfaces[..., 2], surfaces=surfaces, intrinsics=intr, extrinsics=extr,
                  backward_correspondence_weights=jnp.ones((1, NUM_FRAMES - 1, H, W)))

def timeit(name, fn, *args):
    o = fn(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(5):
        t0 = time.time(); o = fn(*args); jax.block_until_ready(o); ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1000:8.1f} ms", flush=True)
    return o

fl = lambda s, e, k: loss_flow(LossFlowCfg(), flows, ModelOutput(depths=None, surfaces=s, intrinsics=k, extrinsics=e, backward_correspondence_weights=None), (H, W))
tr = lambda s, e, k: loss_tracking(LossTrackingCfg(), tracks, ModelOutput(depths=None, surfaces=s, intrinsics=k, extrinsics=e, backward_correspondence_weights=None), (H, W))

timeit("flow loss fwd", jax.jit(fl), surfaces, extr, intr)
timeit("track loss fwd", jax.jit(tr), surfaces, extr, intr)
gfl = jax.jit(jax.grad(fl, argnums=(0, 1, 2)))
gtr = jax.jit(jax.grad(tr, argnums=(0, 1, 2)))
timeit("flow loss fwd+bwd", gfl, surfaces, extr, intr)
timeit("track loss fwd+bwd", gtr, surfaces, extr, intr)

c = jax.jit(gtr).lower(surfaces, extr, intr).compile()
ca = c.cost_analysis()
print({k: f"{v:.3e}" for k, v in ca.items() if k in ("flops", "bytes accessed", "transcendentals")})
m = c.memory_analysis()
print("temp bytes:", getattr(m, "temp_size_in_bytes", None), "peak:", m)
c2 = jax.jit(gfl).lower(surfaces, extr, intr).compile()
ca2 = c2.cost_analysis()
print("flow:", {k: f"{v:.3e}" for k, v in ca2.items() if k in ("flops", "bytes accessed", "transcendentals")})
print("flow temp:", c2.memory_analysis())
