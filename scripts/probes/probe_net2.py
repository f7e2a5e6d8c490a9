"""Probe: MiDaS-small net fwd+bwd, production-shaped (f32 master params cast
to bf16 inside the differentiated function, like apply_midas does)."""
import time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.backbone import midas_net as mn

F, H, W = 150, 160, 224
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(size=(F, 3, H, W)).astype(np.float32), dtype=jnp.bfloat16)
params = mn.midas_small_init(jax.random.PRNGKey(0))  # f32 master

def full(p, x):
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    y, feats = mn.MidasSmall.apply_split(pb, x, mapping="exp")
    return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(feats.astype(jnp.float32) ** 2)

def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:30s} compile={compile_s:6.1f}s  {dt:8.1f} ms", flush=True)

timeit("full fwd (f32 master)", jax.jit(full), params, imgs)
timeit("full fwd+bwd (f32 master)", jax.jit(jax.grad(full)), params, imgs)
print("done")
