"""Probe: frame-folded formulations of the early encoder stages.

Hypothesis: stem..stage2 (C in {3, 24, 32, 144, 192} at 80x112/40x56) costs
33.9 ms fwd+bwd because NHWC tensors with C < 128 pad the lane dimension up
to 128 (up to 5x wasted HBM traffic). Folding G frames into the channel dim
((n, h, w, c) -> (n/G, h, w, G*c)) is EXACT for every op in the region:

- depthwise conv: per-channel spatial stencil -> kernel tiled G times;
- 1x1 conv: block-diagonal -> feature_group_count=G with tiled kernel
  (or an einsum over the unfolded channel split);
- BN batch stats: two-pass with a cross-slot combine (exact);
- relu6 / residual add: elementwise.

Measures one stage-2 MBConv block (24 -> 144 -> 32, stride 2, k3) at
reference scale in each formulation.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

F, H, W = 148, 80, 112  # 148 = divisible by 4
CIN, MID, COUT, K, STRIDE = 24, 144, 32, 3, 2
bf = jnp.bfloat16
rng = np.random.default_rng(0)

x = jnp.asarray(rng.normal(size=(F, H, W, CIN)).astype(np.float32), bf)
w_expand = jnp.asarray(rng.normal(size=(1, 1, CIN, MID)).astype(np.float32) * 0.05, bf)
w_dw = jnp.asarray(rng.normal(size=(K, K, 1, MID)).astype(np.float32) * 0.1, bf)
w_project = jnp.asarray(rng.normal(size=(1, 1, MID, COUT)).astype(np.float32) * 0.05, bf)
bn_scale = {c: jnp.ones((c,)) for c in (MID, COUT)}
bn_bias = {c: jnp.zeros((c,)) for c in (MID, COUT)}


def timeit(name, fn, *args, n=20):
    t0 = time.time()
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} compile={compile_s:6.1f}s  {dt:8.2f} ms", flush=True)


def bn_plain(x, scale, bias, eps=1e-3):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2), keepdims=True)
    s = (jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)
    b = (bias - mean * s).astype(x.dtype)
    return x * s + b


def relu6(v):
    return jnp.clip(v, 0.0, 6.0)


def conv(x, k, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def block_plain(x):
    y = relu6(bn_plain(conv(x, w_expand), bn_scale[MID], bn_bias[MID]))
    y = relu6(bn_plain(conv(y, w_dw, STRIDE, MID), bn_scale[MID], bn_bias[MID]))
    y = bn_plain(conv(y, w_project), bn_scale[COUT], bn_bias[COUT])
    return jnp.sum(y.astype(jnp.float32) ** 2)


def bn_folded(xf_, c, scale, bias, eps=1e-3):
    """BN on (n, h, w, G*c): exact two-pass with cross-slot combine."""
    n, h, w, gc = xf_.shape
    g = gc // c
    xf = xf_.astype(jnp.float32)
    # Pass 1: per-slot sums -> global mean per channel.
    slot_mean = jnp.mean(xf, axis=(0, 1, 2)).reshape(g, c)
    mean = jnp.mean(slot_mean, axis=0)  # (c,)
    mean_t = jnp.tile(mean, g)
    # Pass 2: centered second moment with the GLOBAL mean (exact).
    var = jnp.mean(jnp.square(xf - mean_t), axis=(0, 1, 2)).reshape(g, c)
    var = jnp.mean(var, axis=0)
    s = (jax.lax.rsqrt(var + eps) * scale).astype(xf_.dtype)
    b = (bias - mean * s).astype(xf_.dtype)
    return xf_ * jnp.tile(s, g) + jnp.tile(b, g)


def make_folded(G, one_by_one: str):
    we_g = jnp.tile(w_expand, (1, 1, 1, G)) if False else None

    def conv1x1_grouped(x, k, cout):
        # x: (n, h, w, G*cin); k: (1, 1, cin, cout) -> grouped tiled kernel.
        kk = jnp.concatenate([k] * G, axis=-1)  # block diag via groups
        return conv(x, kk, groups=G)

    def conv1x1_einsum(x, k, cout):
        n, h, w, gc = x.shape
        cin = k.shape[2]
        y = jnp.einsum(
            "nhwgc,co->nhwgo", x.reshape(n, h, w, G, cin), k[0, 0]
        )
        return y.reshape(n, h, w, G * cout)

    c1 = conv1x1_grouped if one_by_one == "grouped" else conv1x1_einsum

    def block(x):
        n, h, w, c = x.shape
        xg = x.reshape(n // G, G, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
            n // G, h, w, G * c
        )
        y = relu6(bn_folded(c1(xg, w_expand, MID), MID, bn_scale[MID], bn_bias[MID]))
        y = relu6(
            bn_folded(
                conv(y, jnp.tile(w_dw, (1, 1, 1, G)), STRIDE, G * MID),
                MID, bn_scale[MID], bn_bias[MID],
            )
        )
        y = bn_folded(c1(y, w_project, COUT), COUT, bn_scale[COUT], bn_bias[COUT])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    return block


# Correctness vs plain (f32 to dodge bf16 noise).
xf32 = x.astype(jnp.float32)
w_e32, w_d32, w_p32 = (w.astype(jnp.float32) for w in (w_expand, w_dw, w_project))


def ref32(x):
    y = relu6(bn_plain(conv(x, w_e32), bn_scale[MID], bn_bias[MID]))
    y = relu6(bn_plain(conv(y, w_d32, STRIDE, MID), bn_scale[MID], bn_bias[MID]))
    y = bn_plain(conv(y, w_p32), bn_scale[COUT], bn_bias[COUT])
    return y


def folded32(x, G):
    n, h, w, c = x.shape
    xg = x.reshape(n // G, G, h, w, c).transpose(0, 2, 3, 1, 4).reshape(n // G, h, w, G * c)
    y = relu6(bn_folded(conv(xg, jnp.concatenate([w_e32] * G, -1), groups=G), MID, bn_scale[MID], bn_bias[MID]))
    y = relu6(bn_folded(conv(y, jnp.tile(w_d32, (1, 1, 1, G)), STRIDE, G * MID), MID, bn_scale[MID], bn_bias[MID]))
    y = bn_folded(conv(y, jnp.concatenate([w_p32] * G, -1), groups=G), COUT, bn_scale[COUT], bn_bias[COUT])
    n2, h2, w2, _ = y.shape
    return y.reshape(n2, h2, w2, G, c * 0 + COUT).transpose(0, 3, 1, 2, 4).reshape(n2 * G, h2, w2, COUT)


# Exactness check under full-precision f32 accumulation (the default TPU
# matmul precision multiplies in bf16, whose ~4e-3 relative error the BN
# layers amplify — dbg on CPU shows the formulations agree to 1e-6).
with jax.default_matmul_precision("highest"):
    ref_out = jax.jit(ref32)(xf32)
    fold_out = jax.jit(lambda x: folded32(x, 4))(xf32)
err = float(jnp.max(jnp.abs(ref_out - fold_out)))
print(f"folded vs plain max abs err (f32 highest): {err:.2e}", flush=True)
assert err < 1e-3, err

timeit("block plain fwd", jax.jit(block_plain), x)
timeit("block plain fwd+bwd", jax.jit(lambda v: jax.grad(block_plain)(v).sum()), x)
for G in (2, 4):
    for mode in ("grouped", "einsum"):
        blk = make_folded(G, mode)
        timeit(f"block folded G={G} {mode} fwd", jax.jit(blk), x)
        timeit(
            f"block folded G={G} {mode} fwd+bwd",
            jax.jit(lambda v, b=blk: jax.grad(b)(v).sum()),
            x,
        )
print("done")
