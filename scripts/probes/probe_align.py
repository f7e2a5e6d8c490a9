"""Probe: align_surfaces fwd+bwd at reference scale on TPU."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.ops.surface import align_surfaces

B, F, H, W = 1, 150, 160, 224
K = 1000
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
surfaces = jax.random.normal(k1, (B, F, H, W, 3)) * 0.1 + jnp.array([0., 0., 2.])
flows = jax.random.normal(k2, (B, F - 1, H, W, 2)) * 0.01
weights = jax.nn.sigmoid(jax.random.normal(k3, (B, F - 1, H, W)))
indices = jnp.linspace(0, H * W - 1, K).astype(jnp.int32)

def loss(s, fl, w):
    t = align_surfaces(s, fl, w, indices)
    return jnp.sum(t ** 2)

g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
t0 = time.time()
val, grads = g(surfaces, flows, weights)
jax.block_until_ready(val)
print(f"compile+first: {time.time()-t0:.1f}s val={float(val):.4f}", flush=True)
for i in range(5):
    t0 = time.time()
    val, grads = g(surfaces, flows, weights)
    jax.block_until_ready(val)
    print(f"iter {i}: {(time.time()-t0)*1000:.1f} ms", flush=True)
print("OK")
