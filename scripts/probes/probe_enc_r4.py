"""Round-4 perf probe: where do the MiDaS conv milliseconds go?

Decomposes encoder vs decoder vs head at reference scale and times
alternative depthwise-conv formulations (conv_general_dilated with
feature_group_count vs an explicit shift-stencil) and BN variants.
"""
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
imgs = jnp.asarray(rng.uniform(size=(F, 3, H, W)).astype(np.float32), dtype=bf)
params = mn.midas_small_init(jax.random.PRNGKey(0))
pb = jax.tree_util.tree_map(lambda a: a.astype(bf), params)


def timeit(name, fn, *args, n=10):
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:42s} compile={compile_s:6.1f}s  {dt:8.2f} ms", flush=True)


def red(t):
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), t, jnp.float32(0)
    )


x_nhwc = jnp.transpose(imgs, (0, 2, 3, 1))

# ---- encoder alone ----
enc = lambda p, x: red(mn._encoder(p["encoder"], x))
timeit("encoder fwd", jax.jit(enc), pb, x_nhwc)
timeit("encoder fwd+bwd", jax.jit(jax.grad(enc)), pb, x_nhwc)

# ---- decoder alone (from random taps) ----
taps = [
    jax.random.normal(jax.random.PRNGKey(i), (F, H // s, W // s, c), dtype=bf)
    for i, (s, c) in enumerate(zip((4, 8, 16, 32), mn._TAP_CHANNELS))
]


def dec(p, taps):
    l1, l2, l3, l4 = taps
    s = p["scratch"]
    l1 = mn._conv(s["layer1_rn"], l1)
    l2 = mn._conv(s["layer2_rn"], l2)
    l3 = mn._conv(s["layer3_rn"], l3)
    l4 = mn._conv(s["layer4_rn"], l4)
    path4 = mn._fusion(p["refinenet4"], l4)
    path3 = mn._fusion(p["refinenet3"], path4, l3)
    path2 = mn._fusion(p["refinenet2"], path3, l2)
    path1 = mn._fusion(p["refinenet1"], path2, l1)
    return red(path1)


timeit("decoder fwd", jax.jit(dec), pb, taps)
timeit("decoder fwd+bwd", jax.jit(jax.grad(dec)), pb, taps)


# ---- head alone ----
def head(p, path1):
    h = p["head"]
    z = mn._conv(h["conv1"], path1)
    y = mn._head_up2_conv_proj(
        z, h["conv2"], h["conv3"]["kernel"][0, 0, :, 0], h["conv3"]["bias"][0]
    )
    return red(y)


path1 = jax.random.normal(jax.random.PRNGKey(9), (F, H // 2, W // 2, 64), dtype=bf)
timeit("head fwd", jax.jit(head), pb, path1)
timeit("head fwd+bwd", jax.jit(jax.grad(head, argnums=(0, 1))), pb, path1)

# ---- depthwise conv formulations at the hot shapes ----
# (spatial, channels, kernel) for the encoder's dw convs (stride-1 cases).
shapes = [
    ((80, 112), 32, 3),
    ((40, 56), 192, 3),
    ((20, 28), 288, 5),
    ((10, 14), 816, 5),
]


def dw_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def dw_stencil(x, k):
    # k: (kh, kw, 1, c) — shift-and-multiply-accumulate formulation.
    kh, kw = k.shape[:2]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    h, w = x.shape[1:3]
    out = jnp.zeros_like(x)
    for dy in range(kh):
        for dx in range(kw):
            out = out + xp[:, dy : dy + h, dx : dx + w, :] * k[dy, dx, 0]
    return out


for (sh, sw), c, ks in shapes:
    x = jax.random.normal(jax.random.PRNGKey(0), (F, sh, sw, c), dtype=bf)
    k = jax.random.normal(jax.random.PRNGKey(1), (ks, ks, 1, c), dtype=bf)
    lbl = f"dw {sh}x{sw} c{c} k{ks}"
    f1 = jax.jit(lambda x, k: red(dw_conv(x, k)))
    f2 = jax.jit(lambda x, k: red(dw_stencil(x, k)))
    timeit(f"{lbl} conv fwd", f1, x, k)
    timeit(f"{lbl} stencil fwd", f2, x, k)
    g1 = jax.jit(jax.grad(lambda x, k: red(dw_conv(x, k)), argnums=(0, 1)))
    g2 = jax.jit(jax.grad(lambda x, k: red(dw_stencil(x, k)), argnums=(0, 1)))
    timeit(f"{lbl} conv fwd+bwd", g1, x, k)
    timeit(f"{lbl} stencil fwd+bwd", g2, x, k)

# ---- BN cost at a hot shape ----
x = jax.random.normal(jax.random.PRNGKey(0), (F, 80, 112, 64), dtype=bf)
bnp = {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
timeit("bn two-pass fwd+bwd", jax.jit(jax.grad(lambda x: red(mn._bn(bnp, x)))), x)


def bn_onepass(params, x, eps=1e-3):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
    ex2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2), keepdims=True)
    var = ex2 - jnp.square(mean)
    scale = (jax.lax.rsqrt(var + eps) * params["scale"]).astype(x.dtype)
    bias = (params["bias"] - mean * scale).astype(x.dtype)
    return x * scale + bias


timeit("bn one-pass fwd+bwd", jax.jit(jax.grad(lambda x: red(bn_onepass(bnp, x)))), x)
print("done")
