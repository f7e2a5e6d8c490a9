"""Parity tests for the fused head-interior kernel (ops/pallas/head_kernel).

The XLA parity-composition path (`midas_net._head_up2_conv_proj` after
`conv1`) is the oracle. At HIGHEST matmul precision both paths are exact in
f32, so tolerances are tight. On CPU the kernel runs in interpret mode via
the runtime gate; the same tests exercise the compiled bf16 kernel on TPU
through test_backbone_midas / the CLI.
"""

import jax
import jax.numpy as jnp
import pytest

from flowmap_tpu.model.backbone.midas_net import (
    MidasSmall,
    midas_small_init,
)
from flowmap_tpu.ops.pallas.runtime import pallas_mode


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))


@pytest.mark.parametrize("shape", [(64, 96), (32, 64), (32, 96)])
def test_head_value_and_grad_parity(shape):
    params = midas_small_init(jax.random.PRNGKey(0), fold_bn=True)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 3, *shape), jnp.float32
    )

    def loss(p, x, mode):
        with pallas_mode(mode):
            with jax.default_matmul_precision("highest"):
                y, f = MidasSmall.apply_split(p, x, "exp")
                return jnp.mean(jnp.sin(y)) + 0.1 * jnp.mean(jnp.cos(f)), y

    f = jax.jit(
        jax.value_and_grad(loss, (0, 1), has_aux=True), static_argnums=2
    )
    (v0, y0), g0 = f(params, x, "off")
    (v1, y1), g1 = f(params, x, "force")
    assert _rel(y1, y0) < 1e-5
    # Per-leaf relative error with a global floor on the denominator:
    # near-cancelling scalar reductions (e.g. the b3 bias grad) have tiny
    # values whose pure relative error only measures f32 summation order.
    gmax = max(
        float(jnp.max(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g0)
    )
    errs = jax.tree_util.tree_map(
        lambda a, b: float(
            jnp.max(jnp.abs(a - b))
            / max(float(jnp.max(jnp.abs(b))), 1e-3 * gmax)
        ),
        g1,
        g0,
    )
    worst = max(jax.tree_util.tree_leaves(errs))
    assert worst < 2e-4, sorted(
        jax.tree_util.tree_leaves_with_path(errs), key=lambda kv: -kv[1]
    )[:3]


def test_head_interior_direct():
    """head_interior == the phases conv + tail on the interior region."""
    from flowmap_tpu.model.backbone.midas_net import (
        _head_parity_kernel,
        _head_tail,
    )
    from flowmap_tpu.ops.pallas.head_kernel import head_interior

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    n, h, w = 2, 16, 20
    path1 = jax.random.normal(ks[0], (n, h, w, 64), jnp.float32)
    conv1 = {
        "kernel": 0.1 * jax.random.normal(ks[1], (3, 3, 64, 32)),
        "bias": 0.1 * jax.random.normal(ks[2], (32,)),
    }
    conv2 = {
        "kernel": 0.1 * jax.random.normal(ks[3], (3, 3, 32, 32)),
        "bias": 0.1 * jax.random.normal(ks[4], (32,)),
    }
    w3 = jax.random.normal(ks[5], (32,))
    b3 = jnp.float32(0.3)

    with jax.default_matmul_precision("highest"):
        # Oracle: z -> phases -> tail, zero-padded (interior semantics).
        def conv(p, x, pad):
            return jax.lax.conv_general_dilated(
                x, p["kernel"], (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]

        z = conv(conv1, path1, "SAME")
        kp = _head_parity_kernel(conv2, jnp.float32)
        phases = jax.lax.conv_general_dilated(
            z, kp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y4_ref = _head_tail(
            phases.reshape(n, h, w, 4, 32), conv2["bias"], w3, b3
        )  # (n, h, w, 4)

        with pallas_mode("force"):
            y4 = head_interior(
                jnp.transpose(path1, (0, 3, 1, 2)),
                conv1["kernel"], conv1["bias"], kp, conv2["bias"], w3, b3,
            )  # (n, 4, h, w)
    # Interior only (borders differ by design: the caller splices strips).
    got = jnp.moveaxis(y4, 1, -1)[:, 1:-1, 1:-1]
    want = y4_ref[:, 1:-1, 1:-1]
    assert _rel(got, want) < 1e-5
