"""Probe: MiDaS-small net component timings at reference scale (bf16).

Bisects encoder / decoder / head / BN cost in fwd and fwd+bwd to find where
the (previously) ~125 ms fwd+bwd goes.
"""
import time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.model.backbone import midas_net as mn

F, H, W = 150, 160, 224
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(size=(F, H, W, 3)).astype(np.float32), dtype=jnp.bfloat16)

params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
    mn.midas_small_init(jax.random.PRNGKey(0)),
)
params_folded = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
    mn.midas_small_init(jax.random.PRNGKey(0), fold_bn=True),
)


def encoder_only(p, x):
    l1, l2, l3, l4 = mn._encoder(p["encoder"], x)
    return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in (l1, l2, l3, l4))


def decoder_only(p, taps):
    s = p["scratch"]
    l1, l2, l3, l4 = taps
    l1 = mn._conv(s["layer1_rn"], l1)
    l2 = mn._conv(s["layer2_rn"], l2)
    l3 = mn._conv(s["layer3_rn"], l3)
    l4 = mn._conv(s["layer4_rn"], l4)
    path4 = mn._fusion(p["refinenet4"], l4)
    path3 = mn._fusion(p["refinenet3"], path4, l3)
    path2 = mn._fusion(p["refinenet2"], path3, l2)
    path1 = mn._fusion(p["refinenet1"], path2, l1)
    return jnp.sum(path1.astype(jnp.float32) ** 2)


def head_only(p, path1):
    h = p["head"]
    y = mn._conv(h["conv1"], path1)
    y = mn._upsample2x(y, align_corners=True)
    y = jax.nn.relu(mn._conv(h["conv2"], y))
    y = mn._conv(h["conv3"], y)
    return jnp.sum(y.astype(jnp.float32) ** 2)


def full(p, x):
    y, feats = mn.MidasSmall.apply_split(p, jnp.transpose(x, (0, 3, 1, 2)), mapping="exp")
    return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(feats.astype(jnp.float32) ** 2)


taps = tuple(
    jnp.asarray(rng.normal(size=(F, H // s, W // s, c)).astype(np.float32), dtype=jnp.bfloat16)
    for s, c in zip((4, 8, 16, 32), (32, 48, 136, 384))
)
path1 = jnp.asarray(rng.normal(size=(F, H // 2, W // 2, 64)).astype(np.float32), dtype=jnp.bfloat16)


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


timeit("encoder fwd", jax.jit(encoder_only), params, imgs)
timeit("encoder fwd+bwd", jax.jit(jax.grad(encoder_only)), params, imgs)
timeit("encoder folded fwd+bwd", jax.jit(jax.grad(encoder_only)), params_folded, imgs)
timeit("decoder fwd", jax.jit(decoder_only), params, taps)
timeit("decoder fwd+bwd", jax.jit(jax.grad(decoder_only)), params, taps)
timeit("head fwd+bwd", jax.jit(jax.grad(head_only)), params, path1)
timeit("full fwd", jax.jit(full), params, imgs)
timeit("full fwd+bwd", jax.jit(jax.grad(full)), params, imgs)
print("done")
