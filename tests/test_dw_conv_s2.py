"""Parity-shift dx backward for the stride-2 depthwise conv
(midas_net._dw_conv_s2) vs the plain XLA formulation: exact value+grad
parity at HIGHEST precision for k=3 and k=5 on even dims."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.model.backbone.midas_net import _dw_conv_s2, _same_pad_s2


def _xla(x, kernel):
    k = kernel.shape[0]
    h, w = x.shape[1], x.shape[2]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2),
        padding=(_same_pad_s2(h, k), _same_pad_s2(w, k)),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_same_pad_matches_xla_string():
    """Explicit pads must equal XLA's "SAME" for stride 2 on even sizes."""
    for size in (8, 40, 56, 80, 112):
        for k in (3, 5):
            x = jnp.ones((1, size, size, 4))
            kern = jnp.ones((k, k, 1, 4))
            a = jax.lax.conv_general_dilated(
                x, kern, (2, 2), "SAME", feature_group_count=4,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b = _xla(x, kern)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", [(2, 16, 24, 6), (1, 40, 56, 8)])
def test_value_and_grad_parity(k, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(k, k, 1, shape[-1])).astype(np.float32)
    )

    def loss(fn, x, kern):
        y = fn(x, kern)
        return jnp.sum(jnp.sin(y * 0.3)), y

    with jax.default_matmul_precision("highest"):
        (v0, y0), g0 = jax.jit(
            jax.value_and_grad(lambda a, b: loss(_xla, a, b), (0, 1), has_aux=True)
        )(x, kern)
        (v1, y1), g1 = jax.jit(
            jax.value_and_grad(
                lambda a, b: loss(_dw_conv_s2, a, b), (0, 1), has_aux=True
            )
        )(x, kern)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]), rtol=1e-5, atol=1e-5)
