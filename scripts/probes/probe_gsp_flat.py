"""Probe: flat-take grid_sample_points vs lax.map version at the faulting shape.

Faulting shape (round 1): n=149 batch, c=3 channels, p=1000 points.
"""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def grid_sample_points_flat(input, xy, padding_mode="border"):
    n, c, h, w = input.shape
    _, p, _ = xy.shape
    x = xy[..., 0] * w - 0.5
    y = xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)
    table = input.transpose(0, 2, 3, 1).reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]

    def corner(yi, xi):
        flat = (base + yi * w + xi).reshape(-1)
        return jnp.take(table, flat, axis=0).reshape(n, p, c)

    v00 = corner(y0c, x0c)
    v01 = corner(y0c, x1c)
    v10 = corner(y1c, x0c)
    v11 = corner(y1c, x1c)
    if padding_mode == "zeros":
        def ib(yi, xi):
            return ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)).astype(input.dtype)[..., None]
        v00 = v00 * ib(y0i, x0i); v01 = v01 * ib(y0i, x1i)
        v10 = v10 * ib(y1i, x0i); v11 = v11 * ib(y1i, x1i)
    tx = tx[..., None]; ty = ty[..., None]
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    out = top * (1 - ty) + bot * ty  # (n, p, c)
    return out.transpose(0, 2, 1)


N, C, H, W, P = 149, 3, 160, 224, 1000
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (N, C, H, W))
xy = jax.random.uniform(jax.random.PRNGKey(1), (N, P, 2))

def loss(i, q):
    return jnp.sum(grid_sample_points_flat(i, q) ** 2)

g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
t0 = time.time()
v, _ = g(img, xy); jax.block_until_ready(v)
print(f"flat compile+first {time.time()-t0:.1f}s v={float(v):.3f}", flush=True)
for i in range(10):
    t0 = time.time()
    v, grads = g(img, xy); jax.block_until_ready(v)
print(f"flat iter: {(time.time()-t0)*1000:.2f} ms", flush=True)

# parity vs current impl on small shapes (CPU check happens in tests; here numeric diff)
from flowmap_tpu.ops.grid_sample import grid_sample_points
ref = jax.jit(grid_sample_points)(img[:4], xy[:4])
new = jax.jit(grid_sample_points_flat)(img[:4], xy[:4])
print("max diff vs current impl:", float(jnp.max(jnp.abs(ref - new))), flush=True)
print("OK")
