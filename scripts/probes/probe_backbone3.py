"""apply_midas decomposition with host-fetch timing."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.backbone.backbone_midas import BackboneMidasCfg, init_midas, apply_midas
from flowmap_tpu.model.backbone.midas_net import MidasSmall
from flowmap_tpu.ops.resize import resize_bilinear
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene

NUM_FRAMES, (H, W) = 150, (160, 224)
batch, flows, _ = make_scene(SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=(H, W)))
cfg = BackboneMidasCfg(pretrained=False, mapping="exp", warp_radius=3, remat=False)
params = init_midas(cfg, NUM_FRAMES, (H, W), jax.random.PRNGKey(0))

def timeit(name, fn, *args, n=5):
    o = float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time(); o = float(fn(*args)); ts.append(time.time()-t0)
    print(f"{name:36s} {min(ts)*1000:8.1f} ms", flush=True)

def red(t):
    return jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), t, 0.0)

full = lambda p: red(apply_midas(cfg, p, batch, flows))
timeit("apply_midas fwd", jax.jit(full), params)
timeit("apply_midas fwd+bwd", jax.jit(lambda p: red(jax.grad(full)(p))), params)

bf = jnp.bfloat16
videos = batch.videos.reshape(-1, 3, H, W).astype(bf)
pb = jax.tree_util.tree_map(lambda x: x.astype(bf), params["midas"])
netf = lambda p: red(MidasSmall.apply_split(p, videos, mapping="exp"))
timeit("net fwd", jax.jit(netf), pb)
timeit("net fwd+bwd", jax.jit(lambda p: red(jax.grad(netf)(p))), pb)

feats = jax.random.normal(jax.random.PRNGKey(1), (150, 64, 80, 112), dtype=bf)
rs = lambda f: red(resize_bilinear(f, (H, W)) / 20.0)
timeit("resize fwd", jax.jit(rs), feats)
timeit("resize fwd+bwd", jax.jit(lambda f: red(jax.grad(rs)(f))), feats)
print("done")
