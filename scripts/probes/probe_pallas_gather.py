"""Can Mosaic lower an in-kernel dynamic gather (take_along_axis) from VMEM?"""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, W, C = 160, 224, 64

def kernel(img_ref, idx_ref, out_ref):
    img = img_ref[:]             # (H*W, C)
    idx = idx_ref[:]             # (H*W, 1) int32
    out_ref[:] = jnp.take_along_axis(img, jnp.broadcast_to(idx, img.shape), axis=0)

@jax.jit
def run(img, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H * W, C), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, idx)

key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H * W, C), dtype=jnp.bfloat16)
idx = jax.random.randint(key, (H * W, 1), 0, H * W, dtype=jnp.int32)
try:
    out = run(img, idx)
    ref = jnp.take_along_axis(img, idx, axis=0)
    print("gather ok, maxdiff:", float(jnp.max(jnp.abs((out - ref).astype(jnp.float32)))))
    t0 = time.time()
    for _ in range(20):
        out = run(img, idx)
    print("time20:", float(jnp.sum(out.astype(jnp.float32))), f"{(time.time()-t0)/20*1000:.2f} ms/it")
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:500])
