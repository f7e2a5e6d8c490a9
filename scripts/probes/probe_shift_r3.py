"""Minimal reproducer: shift_warp kernel fwd+bwd at given radius on TPU."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

ry = int(sys.argv[1]) if len(sys.argv) > 1 else 3
rx = int(sys.argv[2]) if len(sys.argv) > 2 else ry
n, h, w, c = 149, 80, 112, 64

from flowmap_tpu.ops.pallas.shift_warp import warp_shifts_tpu

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
feats = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
# grid displacements within radius
xy = jnp.stack(jnp.meshgrid(
    (jnp.arange(w) + 0.5) / w, (jnp.arange(h) + 0.5) / h, indexing="xy"), -1)
disp = jax.random.uniform(k2, (n, h, w, 2), minval=-0.8, maxval=0.8)
disp = disp * jnp.array([ (rx - 1) / w, (ry - 1) / h ])
grid = (xy[None] + disp) * 2.0 - 1.0


def f(feats):
    out = warp_shifts_tpu(feats, grid, ry, rx)
    return jnp.sum(out.astype(jnp.float32) ** 2)


g = jax.jit(jax.value_and_grad(f))
t0 = time.time()
val, grads = g(feats)
jax.block_until_ready(grads)
print(f"[r{ry},{rx}] compile+run {time.time()-t0:.1f}s val={float(val):.3f}")
for i in range(5):
    t0 = time.time()
    val, grads = g(feats)
    jax.block_until_ready(grads)
    print(f"iter {i}: {(time.time()-t0)*1000:.2f} ms")
print("OK")
