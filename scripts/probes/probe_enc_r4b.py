"""Round-4 perf probe (b): region fwd+bwd times with in-graph grad reduction
(one scalar fetch per call — the (a) probe fetched every grad leaf through
the tunnel, which swamped the measurement)."""
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
    float(jnp.asarray(out).ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / n * 1000
    print(f"{name:42s} compile={compile_s:6.1f}s  {dt:8.2f} ms", flush=True)


def red(t):
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), t, jnp.float32(0)
    )


x_nhwc = jnp.transpose(imgs, (0, 2, 3, 1))

enc = lambda p, x: red(mn._encoder(p["encoder"], x))
timeit("encoder fwd+bwd", jax.jit(lambda p, x: red(jax.grad(enc)(p, x))), pb, x_nhwc)

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
    path4 = mn._fusion(params["refinenet4"], l4) if False else mn._fusion(p["refinenet4"], l4)
    path3 = mn._fusion(p["refinenet3"], path4, l3)
    path2 = mn._fusion(p["refinenet2"], path3, l2)
    path1 = mn._fusion(p["refinenet1"], path2, l1)
    return red(path1)


timeit(
    "decoder fwd+bwd",
    jax.jit(lambda p, t: red(jax.grad(dec, argnums=(0, 1))(p, t))),
    pb, taps,
)


def head(p, path1):
    h = p["head"]
    z = mn._conv(h["conv1"], path1)
    y = mn._head_up2_conv_proj(
        z, h["conv2"], h["conv3"]["kernel"][0, 0, :, 0], h["conv3"]["bias"][0]
    )
    return red(y)


path1 = jax.random.normal(jax.random.PRNGKey(9), (F, H // 2, W // 2, 64), dtype=bf)
timeit(
    "head fwd+bwd",
    jax.jit(lambda p, z: red(jax.grad(head, argnums=(0, 1))(p, z))),
    pb, path1,
)

# Encoder stage split: stem+stage1+stage2 (the small-channel, large-spatial
# part) vs the rest.
enc_p = pb["encoder"]


def enc_early(p, x):
    x = mn._relu6(mn._bn(p["stem_bn"], mn._conv(p["stem_conv"], x, stride=2)))
    idx = 0
    cin = mn._STEM_CHANNELS
    for s, (expand, cout, repeats, stride, kernel) in enumerate(mn._LITE3_STAGES[:2]):
        for r in range(repeats):
            x = mn._mbconv(p["blocks"][idx], x, cin, cout, expand, stride if r == 0 else 1, kernel)
            cin = cout
            idx += 1
    return red(x)


timeit("enc[stem..stage2] fwd", jax.jit(enc_early), enc_p, x_nhwc)
timeit(
    "enc[stem..stage2] fwd+bwd",
    jax.jit(lambda p, x: red(jax.grad(enc_early)(p, x))),
    enc_p, x_nhwc,
)
print("done")
