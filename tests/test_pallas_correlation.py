"""Fused correlation-softmax-expectation kernel vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmap_tpu.ops.pallas.correlation import (
    _reference,
    global_correlation_expectation,
)


def test_matches_reference_small():
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(0, 10, size=(64, 2)).astype(np.float32))
    got = global_correlation_expectation(f0, f1, grid)
    want = _reference(f0, f1, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_chunked_fallback_matches():
    rng = np.random.default_rng(1)
    f0 = jnp.asarray(rng.normal(size=(1, 4608, 8)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(1, 4608, 8)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(0, 64, size=(4608, 2)).astype(np.float32))
    got = global_correlation_expectation(f0, f1, grid)
    want = _reference(f0, f1, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gmflow_still_matches_torch_oracle():
    """The swapped-in kernel must not change GMFlow outputs."""
    import pytest
    from pathlib import Path

    if not Path("/root/reference/flowmap/third_party/gmflow").exists():
        pytest.skip("oracle unavailable")
    import sys

    sys.path.insert(0, "/root/reference/flowmap/third_party/gmflow")
    try:
        import torch

        from gmflow.gmflow import GMFlow

        from flowmap_tpu.flow.gmflow import convert_torch_state_dict, gmflow_forward

        torch.manual_seed(0)
        model = GMFlow(
            feature_channels=128, num_scales=1, upsample_factor=8, num_head=1,
            attention_type="swin", ffn_dim_expansion=4, num_transformer_layers=6,
        ).eval()
        params = convert_torch_state_dict(model.state_dict())
        rng = np.random.default_rng(0)
        img0 = rng.uniform(0, 255, size=(1, 3, 32, 48)).astype(np.float32)
        img1 = np.roll(img0, 2, axis=3)
        with torch.no_grad():
            want = model(
                torch.from_numpy(img0), torch.from_numpy(img1),
                attn_splits_list=[2], corr_radius_list=[-1], prop_radius_list=[-1],
                pred_bidir_flow=False,
            )["flow_preds"][-1].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(gmflow_forward(params, jnp.asarray(img0), jnp.asarray(img1)))
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    finally:
        sys.path.pop(0)


def test_nonmultiple_length_uses_kernel_with_key_masking():
    """L that does not divide the 256 query block (e.g. the pretrain shape
    L=1800) must run the padded kernel — padded keys masked to -inf — and
    match the unpadded reference exactly (VERDICT r4 item 4)."""
    from flowmap_tpu.ops.pallas.runtime import pallas_mode

    rng = np.random.default_rng(2)
    for length in (72, 300, 1800):
        f0 = jnp.asarray(rng.normal(size=(1, length, 16)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, length, 16)).astype(np.float32))
        grid = jnp.asarray(
            rng.uniform(0, 50, size=(length, 2)).astype(np.float32)
        )
        with pallas_mode("force"):
            got = global_correlation_expectation(f0, f1, grid)
        want = _reference(f0, f1, grid)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"L={length}",
        )


def test_bias_matches_reference():
    """The additive-bias path (swin shifted-window mask) must match the
    unfused scores+mask softmax exactly, including with key padding."""
    from flowmap_tpu.ops.pallas.correlation import softmax_expectation
    from flowmap_tpu.ops.pallas.runtime import pallas_mode

    rng = np.random.default_rng(3)
    for length in (64, 300):
        f0 = jnp.asarray(rng.normal(size=(2, length, 16)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(2, length, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, length, 8)).astype(np.float32))
        bias = jnp.asarray(
            np.where(rng.random((2, length, length)) < 0.3, -100.0, 0.0)
            .astype(np.float32)
        )
        with pallas_mode("force"):
            got = softmax_expectation(f0, f1, v, bias=bias)
        corr = jnp.einsum("blc,bmc->blm", f0, f1) / (16**0.5) + bias
        want = jnp.einsum(
            "blm,bmd->bld", jax.nn.softmax(corr, axis=-1), v
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"L={length}",
        )
