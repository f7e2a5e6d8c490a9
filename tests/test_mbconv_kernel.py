"""Parity tests for the fused MBConv Pallas kernels (ops/pallas/mbconv.py).

The XLA reference chain is the numerical oracle. Comparisons run at HIGHEST
matmul precision: the kernel pins its f32 dots to HIGHEST internally, while
the XLA path's default-precision convs round inputs to bf16 even for f32
tensors — at HIGHEST both are exact and tolerances can be tight.

On CPU (CI) the kernels run in interpret mode via the central runtime gate;
on TPU the same tests exercise the compiled kernels.
"""

import jax
import jax.numpy as jnp
import pytest

from flowmap_tpu.ops.pallas.mbconv import (
    MBConvSpec,
    _reference_chain,
    mbconv_chain,
)
from flowmap_tpu.ops.pallas.runtime import pallas_mode


def _mkblk(key, cin, cmid, cout, k):
    ks = jax.random.split(key, 6)
    return {
        "expand_conv": {
            "kernel": 0.1 * jax.random.normal(ks[0], (1, 1, cin, cmid)),
            "bias": 0.05 * jax.random.normal(ks[1], (cmid,)),
        },
        "dw_conv": {
            "kernel": 0.2 * jax.random.normal(ks[2], (k, k, 1, cmid)),
            "bias": 0.05 * jax.random.normal(ks[3], (cmid,)),
        },
        "project_conv": {
            "kernel": 0.05 * jax.random.normal(ks[4], (1, 1, cmid, cout)),
            "bias": 0.05 * jax.random.normal(ks[5], (cout,)),
        },
    }


CONFIGS = [
    # (cin, cmid, cout, k, residual, n, h, w) — shapes covering the encoder's
    # block families: k3/k5, residual/expanding, W not a sublane multiple,
    # frames not a multiple of the frame block.
    (16, 96, 24, 5, False, 4, 10, 14),
    (24, 144, 24, 5, True, 4, 10, 14),
    (16, 96, 16, 3, True, 4, 12, 16),
    (24, 144, 24, 5, True, 11, 6, 9),
]


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))


@pytest.mark.parametrize("cfg", CONFIGS)
def test_single_block_value_and_grad(cfg):
    cin, cmid, cout, k, res, n, h, w = cfg
    specs = (MBConvSpec(cin, cmid, cout, k, res),)
    params = (_mkblk(jax.random.PRNGKey(cin + k), cin, cmid, cout, k),)
    x = jax.random.normal(jax.random.PRNGKey(7), (n, h, w, cin), jnp.float32)

    def loss(x, params, mode):
        with pallas_mode(mode):
            with jax.default_matmul_precision("highest"):
                return jnp.sum(jnp.sin(mbconv_chain(x, specs, params)))

    f = jax.jit(jax.value_and_grad(loss, (0, 1)), static_argnums=2)
    v0, g0 = f(x, params, "off")
    v1, g1 = f(x, params, "force")
    assert abs(float(v1 - v0)) < 5e-3
    errs = jax.tree_util.tree_map(_rel, g1, g0)
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-4, errs


def test_multi_block_chain():
    specs = (
        MBConvSpec(16, 96, 24, 5, False),
        MBConvSpec(24, 144, 24, 5, True),
        MBConvSpec(24, 144, 40, 3, False),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    params = tuple(
        _mkblk(kk, s.cin, s.cmid, s.cout, s.kernel)
        for kk, s in zip(keys, specs)
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 8, 11, 16), jnp.float32)

    with jax.default_matmul_precision("highest"):
        ref = _reference_chain(x, specs, params)
        with pallas_mode("force"):
            out = jax.jit(lambda x, p: mbconv_chain(x, specs, p))(x, params)
    assert _rel(out, ref) < 1e-5

    def loss(x, params, mode):
        with pallas_mode(mode):
            with jax.default_matmul_precision("highest"):
                return jnp.sum(jnp.cos(mbconv_chain(x, specs, params)))

    f = jax.jit(jax.grad(loss, (0, 1)), static_argnums=2)
    g0 = f(x, params, "off")
    g1 = f(x, params, "force")
    errs = jax.tree_util.tree_map(_rel, g1, g0)
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-4, errs


def test_bf16_path_close():
    """bf16 compute: kernel tracks the XLA chain within bf16 noise."""
    spec = (MBConvSpec(24, 144, 24, 3, True),)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        (_mkblk(jax.random.PRNGKey(1), 24, 144, 24, 3),),
    )
    x = jax.random.normal(
        jax.random.PRNGKey(2), (4, 8, 12, 24), jnp.bfloat16
    )
    ref = _reference_chain(x, spec, params).astype(jnp.float32)
    with pallas_mode("force"):
        out = jax.jit(lambda x, p: mbconv_chain(x, spec, p))(
            x, params
        ).astype(jnp.float32)
    assert _rel(out, ref) < 0.1


def test_encoder_integration_parity():
    """Folded-BN MiDaS encoder: kernel path == XLA path at HIGHEST."""
    from flowmap_tpu.model.backbone.midas_net import (
        MidasSmall,
        midas_small_init,
    )

    params = midas_small_init(jax.random.PRNGKey(0), fold_bn=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 96), jnp.float32)

    def run(mode):
        with pallas_mode(mode):
            with jax.default_matmul_precision("highest"):
                y, f = jax.jit(
                    lambda p, x: MidasSmall.apply_split(p, x, "exp")
                )(params, x)
        return y, f

    import os

    os.environ["FLOWMAP_MBCONV_MIN_HW"] = "0"
    try:
        y0, f0 = run("off")
        y1, f1 = run("force")
    finally:
        del os.environ["FLOWMAP_MBCONV_MIN_HW"]
    assert _rel(y1, y0) < 1e-4
    assert _rel(f1, f0) < 1e-4
