"""Decompose MiDaS backbone cost: encoder/decoder/head/warp/MLP, remat on/off."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.backbone.midas_net import (
    MidasSmall, midas_small_init, _encoder, _conv, _fusion, _upsample2x,
)
import flowmap_tpu.model.backbone.midas_net as mn

N, H, W = 150, 160, 224
key = jax.random.PRNGKey(0)
videos = jax.random.uniform(key, (N, 3, H, W))
params = midas_small_init(key)
bf16 = jnp.bfloat16
pb = jax.tree_util.tree_map(lambda x: x.astype(bf16), params)
vb = videos.astype(bf16)

def timeit(name, fn, *args, n=5):
    o = fn(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(n):
        t0 = time.time(); o = fn(*args); jax.block_until_ready(o); ts.append(time.time()-t0)
    print(f"{name:36s} {min(ts)*1000:8.1f} ms", flush=True)
    return o

def enc(p, v):
    x = jnp.transpose(v, (0, 2, 3, 1))
    return _encoder(p["encoder"], x)

timeit("encoder fwd bf16", jax.jit(enc), pb, vb)
timeit("full net fwd bf16", jax.jit(lambda p, v: MidasSmall.apply_split(p, v, mapping="exp")), pb, vb)
timeit("full net fwd f32", jax.jit(lambda p, v: MidasSmall.apply_split(p, v, mapping="exp")), params, videos)

def net_loss(p, v):
    y, feats = MidasSmall.apply_split(p, v, mapping="exp")
    return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(feats.astype(jnp.float32) ** 2)

timeit("full net fwd+bwd bf16 noremat", jax.jit(jax.grad(net_loss)), pb, vb)
rem = jax.checkpoint(lambda p, v: MidasSmall.apply_split(p, v, mapping="exp"))
def net_loss_rem(p, v):
    y, feats = rem(p, v)
    return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(feats.astype(jnp.float32) ** 2)
timeit("full net fwd+bwd bf16 remat", jax.jit(jax.grad(net_loss_rem)), pb, vb)

# upsample2x cost at the head scale
x = jax.random.normal(key, (N, 80, 112, 32), dtype=bf16)
timeit("upsample2x (N,80,112,32) fwd", jax.jit(lambda q: _upsample2x(q)), x)
timeit("upsample2x fwd+bwd", jax.jit(jax.grad(lambda q: jnp.sum(_upsample2x(q).astype(jnp.float32)**2))), x)

# warp at radius 3 (pallas impl) fwd+bwd
from flowmap_tpu.ops.pallas.warp_kernel import warp_features
feats = jax.random.normal(key, (N - 1, 64, H, W), dtype=bf16)
grid = jax.random.uniform(key, (N - 1, H, W, 2), dtype=bf16) * 0.02 - 0.01 + \
    jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, W, dtype=bf16), jnp.linspace(-1, 1, H, dtype=bf16)), -1)
timeit("pallas warp r3 fwd", jax.jit(lambda f, g: warp_features(f, g, 3)), feats, grid)
timeit("pallas warp r3 fwd+bwd", jax.jit(jax.grad(lambda f, g: jnp.sum(warp_features(f, g, 3).astype(jnp.float32)**2), argnums=0)), feats, grid)
print("done")
