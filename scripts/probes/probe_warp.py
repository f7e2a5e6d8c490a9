"""Compare warp implementations at reference scale, bf16, radius 3."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.ops.pallas.warp_kernel import warp_features
from flowmap_tpu.ops.warp import warp_bilinear_matmul
from flowmap_tpu.ops.grid_sample import grid_sample_2d

N, C, H, W = 149, 64, 160, 224
bf16 = jnp.bfloat16
key = jax.random.PRNGKey(0)
feats = jax.random.normal(key, (N, C, H, W), dtype=bf16)
base = jnp.stack(jnp.meshgrid(
    (jnp.arange(W) + 0.5) / W, (jnp.arange(H) + 0.5) / H), -1)
flow = jax.random.uniform(key, (N, H, W, 2), dtype=jnp.float32) * 0.02 - 0.01
grid = ((base[None] + flow) * 2.0 - 1.0).astype(bf16)

def timeit(name, fn, *args, n=5):
    o = float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time(); o = float(fn(*args)); ts.append(time.time()-t0)
    print(f"{name:34s} {min(ts)*1000:8.1f} ms", flush=True)

def red(t):
    return jnp.sum(t.astype(jnp.float32) ** 2)

for name, f in [
    ("pallas r3", lambda ff, gg: warp_features(ff, gg, 3)),
    ("matmul r3", lambda ff, gg: warp_bilinear_matmul(ff, gg, radius=3)),
    ("xla gather", lambda ff, gg: grid_sample_2d(ff, gg, padding_mode="zeros")),
]:
    try:
        timeit(f"{name} fwd", jax.jit(lambda ff, gg, f=f: red(f(ff, gg))), feats, grid)
        timeit(f"{name} fwd+bwd", jax.jit(lambda ff, gg, f=f: red(jax.grad(lambda q: red(f(q, gg)))(ff))), feats, grid)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
print("done")
