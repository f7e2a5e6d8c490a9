"""GMFlow port tests: numerical parity with the public torch implementation.

The torch GMFlow (vendored under the reference checkout's third_party — public
code by Xu et al.) serves as an oracle: we instantiate it with random weights,
convert the state_dict with `convert_torch_state_dict`, and require the JAX
port to reproduce its output. Skipped when the oracle isn't importable.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.flow.gmflow import (
    convert_torch_state_dict,
    gmflow_forward,
    init_params,
)

_GMFLOW_ROOT = Path("/root/reference/flowmap/third_party/gmflow")


def _load_torch_gmflow():
    if not _GMFLOW_ROOT.exists():
        pytest.skip("reference GMFlow oracle not available")
    sys.path.insert(0, str(_GMFLOW_ROOT))
    try:
        from gmflow.gmflow import GMFlow
    finally:
        sys.path.pop(0)
    import torch

    torch.manual_seed(0)
    model = GMFlow(
        feature_channels=128,
        num_scales=1,
        upsample_factor=8,
        num_head=1,
        attention_type="swin",
        ffn_dim_expansion=4,
        num_transformer_layers=6,
    )
    model.eval()
    return model


def test_forward_shapes_and_finiteness():
    params = init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 48)) * 255
    flow = gmflow_forward(params, img, img)
    assert flow.shape == (2, 32, 48, 2)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_parity_with_torch_oracle():
    import torch

    model = _load_torch_gmflow()
    params = convert_torch_state_dict(model.state_dict())

    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 255, size=(1, 3, 32, 48)).astype(np.float32)
    img1 = np.roll(img0, shift=2, axis=3) + rng.normal(
        0, 2, size=img0.shape
    ).astype(np.float32)

    with torch.no_grad():
        result = model(
            torch.from_numpy(img0),
            torch.from_numpy(img1),
            attn_splits_list=[2],
            corr_radius_list=[-1],
            prop_radius_list=[-1],
            pred_bidir_flow=False,
        )
    want = result["flow_preds"][-1].numpy().transpose(0, 2, 3, 1)  # NCHW->NHWC

    got = np.asarray(gmflow_forward(params, jnp.asarray(img0), jnp.asarray(img1)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_identity_images_give_small_flow():
    """With converted real-structure weights and identical images, the flow
    should be near zero (correlation is symmetric around self-match)."""
    model = _load_torch_gmflow()
    params = convert_torch_state_dict(model.state_dict())
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, size=(1, 3, 32, 32)).astype(np.float32))
    flow = np.asarray(gmflow_forward(params, img, img))
    # Random weights: not exactly zero, but bounded by the image size.
    assert np.abs(flow).max() < 32


def test_bfloat16_inference_close_to_f32():
    """The pretrain-path bf16 knob (configs/pretrain.yaml) must produce flow
    close to the f32 net: same graph, activations rounded to bf16, f32
    output. Tolerance reflects bf16's ~3 significant digits accumulated
    through the 6-layer transformer."""
    import numpy as np
    import jax.numpy as jnp

    from flowmap_tpu.flow.gmflow import GMFlowPredictor
    from flowmap_tpu.flow.predictors import FlowPredictorGMFlowCfg

    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.uniform(size=(1, 3, 3, 32, 48)).astype(np.float32))

    flow32 = GMFlowPredictor(FlowPredictorGMFlowCfg())(videos)
    flow16 = GMFlowPredictor(
        FlowPredictorGMFlowCfg(compute_dtype="bfloat16")
    )(videos)
    assert flow16.dtype == jnp.float32
    # With RANDOM weights the near-uniform attention softmaxes amplify bf16
    # rounding (a trained net's peaked distributions are far less
    # sensitive), so the bound is statistical: strong correlation + small
    # mean deviation relative to the flow scale.
    scale = float(jnp.max(jnp.abs(flow32))) + 1e-6
    mean_rel = float(jnp.mean(jnp.abs(flow16 - flow32))) / scale
    corr = float(jnp.corrcoef(flow32.ravel(), flow16.ravel())[0, 1])
    assert mean_rel < 0.1, mean_rel
    assert corr > 0.9, corr
