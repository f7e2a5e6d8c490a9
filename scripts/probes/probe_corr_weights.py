"""Probe: fused corr_weights kernel on TPU at reference scale.

Times fwd and fwd+bwd of the fused upsample+warp+MLP kernel against the
unfused composition (resize + pallas warp + einsum MLP) at 150 frames,
160x224. Usage: probe_corr_weights.py [radius]
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

radius = int(sys.argv[1]) if len(sys.argv) > 1 else 3

import flowmap_tpu.ops.pallas.corr_weights as cw

F, H, W, C = 150, 160, 224, 64
HN, WN = H // 2, W // 2
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(F, HN, WN, C)).astype(np.float32), dtype=jnp.bfloat16)
xs = (np.arange(W) + 0.5) / W
ys = (np.arange(H) + 0.5) / H
base = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)[None]
flow = (rng.uniform(size=(F - 1, H, W, 2)) - 0.5) * 2 * (radius - 1.5)
flow = flow / np.asarray([W, H])
grid = jnp.asarray(((base + flow) * 2 - 1).astype(np.float32))

def make_mlp(key):
    dims = [(128, 128), (128, 64), (64, 1)]
    out, k = [], key
    for din, dout in dims:
        k, s1, s2 = jax.random.split(k, 3)
        out.append({
            "kernel": (2.0 / din) ** 0.5 * jax.random.normal(s1, (din, dout)),
            "bias": jnp.zeros((dout,)),
        })
    return out

mlp = make_mlp(jax.random.PRNGKey(0))

def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 5
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:32s} compile={compile_s:6.1f}s  {dt:8.1f} ms", flush=True)

fwd_fused = jax.jit(lambda f, g, m: cw.corr_weights(f, g, m, radius))
timeit("fused fwd", fwd_fused, feats, grid, mlp)

g_fused = jax.jit(jax.grad(lambda f, m: jnp.sum(cw.corr_weights(f, grid, m, radius) ** 2), argnums=(0, 1)))
timeit("fused fwd+bwd", g_fused, feats, mlp)

fwd_ref = jax.jit(lambda f, g, m: cw.corr_weights_ref(f, g, m, radius))
timeit("unfused fwd", fwd_ref, feats, grid, mlp)

g_ref = jax.jit(jax.grad(lambda f, m: jnp.sum(cw.corr_weights_ref(f, grid, m, radius) ** 2), argnums=(0, 1)))
timeit("unfused fwd+bwd", g_ref, feats, mlp)

# Parity on-chip (fwd).
a = np.asarray(fwd_fused(feats, grid, mlp))
b = np.asarray(fwd_ref(feats, grid, mlp))
print("max |fused - unfused| =", np.abs(a - b).max(), flush=True)
print("done")
