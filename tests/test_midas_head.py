"""Parity of the fused MiDaS head tail vs the torch composition.

The head's x2 upsample is align_corners=False (upstream MiDaS `blocks.py`
Interpolate default; `midas_net_custom.py` output_conv does not override
it), which makes upsample+conv2 parity-periodic — `_head_up2_conv_proj`
computes relu(conv2(up2(z))) @ w3 + b3 without materializing the
full-resolution activation. This test pins it, values and gradients,
against the straightforward torch composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from flowmap_tpu.model.backbone.midas_net import _head_up2_conv_proj


def _torch_head_tail(z_nchw, w2, b2, w3, b3):
    up = F.interpolate(
        z_nchw, scale_factor=2, mode="bilinear", align_corners=False
    )
    y = F.relu(F.conv2d(up, w2, b2, padding=1))
    return F.conv2d(y, w3, b3)[:, 0]


def _random_case(seed, n=2, h=7, w=9, cin=5, cout=6):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    w2 = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.4
    b2 = rng.standard_normal((cout,)).astype(np.float32)
    w3 = rng.standard_normal((cout,)).astype(np.float32)
    b3 = np.float32(rng.standard_normal())
    return z, w2, b2, w3, b3


def _fused(z, w2, b2, w3, b3):
    return _head_up2_conv_proj(
        jnp.asarray(z),
        {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)},
        jnp.asarray(w3),
        jnp.asarray(b3),
    )


def test_head_matches_torch():
    z, w2, b2, w3, b3 = _random_case(0)
    got = np.asarray(_fused(z, w2, b2, w3, b3))
    ref = _torch_head_tail(
        torch.from_numpy(z).permute(0, 3, 1, 2),
        torch.from_numpy(w2).permute(3, 2, 0, 1),
        torch.from_numpy(b2),
        torch.from_numpy(w3)[None, :, None, None],
        torch.from_numpy(np.asarray([b3])),
    ).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_head_matches_torch_model_shape():
    # Half-res shape divisors matching the bench scene (scaled down).
    z, w2, b2, w3, b3 = _random_case(1, n=1, h=20, w=28, cin=32, cout=32)
    got = np.asarray(_fused(z, w2, b2, w3, b3))
    ref = _torch_head_tail(
        torch.from_numpy(z).permute(0, 3, 1, 2),
        torch.from_numpy(w2).permute(3, 2, 0, 1),
        torch.from_numpy(b2),
        torch.from_numpy(w3)[None, :, None, None],
        torch.from_numpy(np.asarray([b3])),
    ).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_head_gradients_match_torch():
    z, w2, b2, w3, b3 = _random_case(2, n=1, h=6, w=8, cin=4, cout=5)

    def loss_jax(z_, w2_, b2_, w3_, b3_):
        y = _head_up2_conv_proj(z_, {"kernel": w2_, "bias": b2_}, w3_, b3_)
        return jnp.sum(jnp.sin(y))

    grads = jax.grad(loss_jax, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(z),
        jnp.asarray(w2),
        jnp.asarray(b2),
        jnp.asarray(w3),
        jnp.asarray(b3),
    )

    zt = torch.from_numpy(z).permute(0, 3, 1, 2).requires_grad_(True)
    w2t = torch.from_numpy(w2).permute(3, 2, 0, 1).requires_grad_(True)
    b2t = torch.from_numpy(b2).requires_grad_(True)
    w3t = torch.from_numpy(w3)[None, :, None, None].requires_grad_(True)
    b3t = torch.from_numpy(np.asarray([b3])).requires_grad_(True)
    torch.sin(_torch_head_tail(zt, w2t, b2t, w3t, b3t)).sum().backward()

    np.testing.assert_allclose(
        np.asarray(grads[0]),
        zt.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(grads[1]),
        w2t.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(grads[2]), b2t.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads[3]), w3t.grad[0, :, 0, 0].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(grads[4]), b3t.grad[0].numpy(), rtol=1e-4, atol=1e-4
    )
