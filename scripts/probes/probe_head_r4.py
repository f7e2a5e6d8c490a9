"""Head formulations A/B at reference scale: the parity-composition
(_head_up2_conv_proj, shipped) vs materialized upsample+conv+proj, and a
bf16-tail variant of the parity path."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.backbone import midas_net as mn

F, H, W = 150, 160, 224
bf = jnp.bfloat16
rng = np.random.default_rng(0)
path1 = jnp.asarray(rng.normal(size=(F, H // 2, W // 2, 64)).astype(np.float32), bf)
params = mn.midas_small_init(jax.random.PRNGKey(0))
pb = jax.tree_util.tree_map(lambda a: a.astype(bf), params)


def timeit(name, fn, *args, n=15):
    t0 = time.time()
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    print(f"{name:34s} compile={c:5.1f}s {(time.time()-t0)/n*1000:8.2f} ms", flush=True)


def red(t):
    return jnp.sum(t.astype(jnp.float32) ** 2)


def head_parity(p, z_in):
    h = p["head"]
    z = mn._conv(h["conv1"], z_in)
    return red(mn._head_up2_conv_proj(
        z, h["conv2"], h["conv3"]["kernel"][0, 0, :, 0], h["conv3"]["bias"][0]
    ))


def head_materialized(p, z_in):
    h = p["head"]
    z = mn._conv(h["conv1"], z_in)
    z = mn._upsample2x(z, align_corners=False)
    z = jax.nn.relu(mn._conv(h["conv2"], z))
    w3 = h["conv3"]["kernel"][0, 0, :, 0]
    y = jnp.einsum("nhwc,c->nhw", z, w3) + h["conv3"]["bias"][0]
    return red(y)


timeit("parity fwd", jax.jit(head_parity), pb, path1)
timeit("parity fwd+bwd", jax.jit(lambda p, z: red(jax.grad(head_parity, argnums=(0, 1))(p, z)[1])), pb, path1)
timeit("materialized fwd", jax.jit(head_materialized), pb, path1)
timeit("materialized fwd+bwd", jax.jit(lambda p, z: red(jax.grad(head_materialized, argnums=(0, 1))(p, z)[1])), pb, path1)
print("done")
