"""Probe: native-res correspondence-weight region variants at reference scale.

Times fwd+bwd of the half-res warp + MLP + 1ch upsample region for each warp
impl, plus the MiDaS net alone, to steer optimization.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

F, H, W, C = 150, 160, 224, 64
HN, WN = H // 2, W // 2
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(F, C, HN, WN)).astype(np.float32), dtype=jnp.bfloat16)
xs = (np.arange(WN) + 0.5) / WN
ys = (np.arange(HN) + 0.5) / HN
base = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)[None]
flow = (rng.uniform(size=(F - 1, HN, WN, 2)) - 0.5) * 2 * 1.5
flow = flow / np.asarray([WN, HN])
grid = jnp.asarray(((base + flow) * 2 - 1).astype(np.float32), dtype=jnp.bfloat16)

def make_mlp(key):
    dims = [(128, 128), (128, 64), (64, 1)]
    out, k = [], key
    for din, dout in dims:
        k, s1, s2 = jax.random.split(k, 3)
        out.append({
            "kernel": ((2.0 / din) ** 0.5 * jax.random.normal(s1, (din, dout))).astype(jnp.bfloat16),
            "bias": jnp.zeros((dout,), jnp.bfloat16),
        })
    return out

mlp = make_mlp(jax.random.PRNGKey(0))

def region(warp_impl):
    def fn(feats, mlp):
        from flowmap_tpu.ops.resize import resize_bilinear
        if warp_impl == "pallas":
            from flowmap_tpu.ops.pallas.warp_kernel import warp_features
            warped = warp_features(feats[:-1], grid, 3)
        elif warp_impl == "matmul":
            from flowmap_tpu.ops.warp import warp_bilinear_matmul
            warped = warp_bilinear_matmul(feats[:-1], grid, radius=3)
        layer0 = mlp[0]
        w_a = layer0["kernel"][:C]
        w_b = layer0["kernel"][C:]
        x = (
            jnp.einsum("nchw,ck->nhwk", warped, w_a)
            + jnp.einsum("nchw,ck->nhwk", feats[1:], w_b)
            + layer0["bias"]
        )
        x = jax.nn.relu(x)
        for i, layer in enumerate(mlp[1:]):
            x = x @ layer["kernel"] + layer["bias"]
            if i < len(mlp) - 2:
                x = jax.nn.relu(x)
        wt = jnp.clip(jax.nn.sigmoid(x[..., 0].astype(jnp.float32)), 1e-4, None)
        return resize_bilinear(wt[:, None], (H, W))[:, 0]
    return fn

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
    print(f"{name:34s} compile={compile_s:6.1f}s  {dt:8.1f} ms", flush=True)

for impl in ("pallas", "matmul"):
    f = region(impl)
    timeit(f"native region {impl} fwd", jax.jit(f), feats, mlp)
    g = jax.jit(jax.grad(lambda fe, m: jnp.sum(region(impl)(fe, m) ** 2), argnums=(0, 1)))
    timeit(f"native region {impl} fwd+bwd", g, feats, mlp)
print("done")
