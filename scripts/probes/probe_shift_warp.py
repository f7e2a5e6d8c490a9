"""Probe: shift-stencil warp kernel fwd / fwd+bwd on the real chip."""
import sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.ops.pallas.shift_warp import warp_shifts_tpu

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
ry = int(sys.argv[2]) if len(sys.argv) > 2 else 3
rx = int(sys.argv[3]) if len(sys.argv) > 3 else 9

n, h, w, c = 149, 80, 112, 64
key = jax.random.PRNGKey(0)
feats = jax.random.normal(key, (n, h, w, c), jnp.bfloat16)
grid = jax.random.uniform(jax.random.PRNGKey(1), (n, h, w, 2), jnp.float32, -1, 1) * 0.02 + \
    jnp.stack(jnp.meshgrid(
        (jnp.arange(w) + 0.5) / w * 2 - 1, (jnp.arange(h) + 0.5) / h * 2 - 1,
    ), -1)[None]

if mode == "fwd":
    fn = jax.jit(lambda f, g: warp_shifts_tpu(f, g, ry, rx).sum())
else:
    fn = jax.jit(lambda f, g: jax.grad(
        lambda f_: (warp_shifts_tpu(f_, g, ry, rx).astype(jnp.float32) ** 2).sum()
    )(f).astype(jnp.float32).sum())

t0 = time.time()
out = fn(feats, grid)
jax.block_until_ready(out)
print(f"[{mode} ry={ry} rx={rx}] compile+first {time.time()-t0:.1f}s val={float(out):.3f}", flush=True)
for i in range(5):
    t0 = time.time()
    out = fn(feats, grid)
    jax.block_until_ready(out)
    print(f"iter {i}: {(time.time()-t0)*1000:.2f} ms", flush=True)
print("OK")
