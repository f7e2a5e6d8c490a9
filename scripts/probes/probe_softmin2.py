"""Isolated softmin sweep fwd+bwd timing + trace at reference scale."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.intrinsics.intrinsics import IntrinsicsSoftminCfg, RegressionCfg, _softmin_sweep

h, w, f = 160, 224, 150
cfg = IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100))
key = jax.random.PRNGKey(0)
backward0 = 0.01 * jax.random.normal(key, (1, h, w, 2), jnp.float32)
depths01 = 1.0 + jax.random.uniform(key, (1, 2, h, w), jnp.float32)
weights0 = jax.random.uniform(key, (1, h, w), jnp.float32)


def loss(depths01, backward0, weights0):
    k, focal = _softmin_sweep(cfg, f, backward0, depths01, weights0, jax.random.PRNGKey(1))
    return jnp.sum(k) + focal


g = jax.jit(jax.value_and_grad(loss))
v, gr = g(depths01, backward0, weights0)
jax.block_until_ready(gr)
t0 = time.time()
for _ in range(20):
    v, gr = g(depths01, backward0, weights0)
float(v)
print(f"sweep fwd+bwd: {(time.time()-t0)/20*1000:.2f} ms")

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_softmin"
with jax.profiler.trace(out):
    for _ in range(3):
        v, gr = g(depths01, backward0, weights0)
    float(v)
print("traced to", out)
