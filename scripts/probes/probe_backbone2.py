"""Same decomposition but with host-fetch timing (block_until_ready is unreliable on axon)."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.backbone.midas_net import MidasSmall, midas_small_init, _encoder, _upsample2x

N, H, W = 150, 160, 224
key = jax.random.PRNGKey(0)
videos = jax.random.uniform(key, (N, 3, H, W))
params = midas_small_init(key)
bf16 = jnp.bfloat16
pb = jax.tree_util.tree_map(lambda x: x.astype(bf16), params)
vb = videos.astype(bf16)

def timeit(name, fn, *args, n=5):
    o = float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time(); o = float(fn(*args)); ts.append(time.time()-t0)
    print(f"{name:36s} {min(ts)*1000:8.1f} ms", flush=True)

def red(tree):
    return jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x.astype(jnp.float32)), tree, 0.0)

timeit("encoder fwd bf16", jax.jit(lambda p, v: red(_encoder(p["encoder"], jnp.transpose(v, (0,2,3,1))))), pb, vb)
timeit("full net fwd bf16", jax.jit(lambda p, v: red(MidasSmall.apply_split(p, v, mapping="exp"))), pb, vb)
timeit("full net fwd f32", jax.jit(lambda p, v: red(MidasSmall.apply_split(p, v, mapping="exp"))), params, videos)

def net_loss(p, v):
    y, feats = MidasSmall.apply_split(p, v, mapping="exp")
    return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(feats.astype(jnp.float32) ** 2)
timeit("net fwd+bwd bf16 noremat", jax.jit(lambda p, v: red(jax.grad(net_loss)(p, v))), pb, vb)
rem = jax.checkpoint(lambda p, v: MidasSmall.apply_split(p, v, mapping="exp"))
def net_loss_rem(p, v):
    y, feats = rem(p, v)
    return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(feats.astype(jnp.float32) ** 2)
timeit("net fwd+bwd bf16 remat", jax.jit(lambda p, v: red(jax.grad(net_loss_rem)(p, v))), pb, vb)

from flowmap_tpu.ops.pallas.warp_kernel import warp_features
feats = jax.random.normal(key, (N - 1, 64, H, W), dtype=bf16)
grid = jax.random.uniform(key, (N - 1, H, W, 2), dtype=bf16) * 0.02 - 0.01 + \
    jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, W, dtype=bf16), jnp.linspace(-1, 1, H, dtype=bf16)), -1)
timeit("pallas warp r3 fwd", jax.jit(lambda f, g: jnp.sum(warp_features(f, g, 3).astype(jnp.float32))), feats, grid)
timeit("pallas warp r3 fwd+bwd", jax.jit(lambda f, g: red(jax.grad(lambda ff, gg: jnp.sum(warp_features(ff, gg, 3).astype(jnp.float32)**2), argnums=0)(f, g))), feats, grid)
print("done")
