"""RAFT port validation against the torch replica oracle (VERDICT r1: the
round-1 port had no oracle validation).

`tests/torch_raft_replica.RaftTorch` reconstructs canonical RAFT-large with
the princeton-vl checkpoint key schema; random weights + eval mode. The JAX
port must consume its full state_dict and reproduce the flow output."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flowmap_tpu.flow.raft import convert_torch_state_dict, raft_forward


@pytest.fixture(scope="module")
def replica():
    from tests.torch_raft_replica import RaftTorch

    torch.manual_seed(0)
    model = RaftTorch()
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_converter_consumes_all_keys(replica):
    sd = replica.state_dict()
    params = convert_torch_state_dict(sd)
    expected = {
        k for k in sd if "num_batches_tracked" not in k
    }
    assert set(params.keys()) == expected


def test_raft_forward_matches_torch(replica):
    params = convert_torch_state_dict(replica.state_dict())
    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    img1 = np.clip(
        img0 + rng.normal(0, 0.05, img0.shape).astype(np.float32), 0, 1
    )

    with torch.no_grad():
        flow_t = replica(
            torch.from_numpy(img0), torch.from_numpy(img1), iters=4
        ).numpy()

    with jax.default_matmul_precision("highest"):
        flow_j = jax.jit(lambda p, a, b: raft_forward(p, a, b, num_iters=4))(
            params, jnp.asarray(img0), jnp.asarray(img1)
        )
    flow_j = np.asarray(flow_j).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(flow_j, flow_t, atol=5e-3, rtol=1e-3)


def _princeton_to_torchvision(key: str) -> str:
    """Inverse rename (test-only) to synthesize a torchvision-schema dict."""
    import re

    k = key
    if k.startswith(("fnet.", "cnet.")):
        prefix = "feature_encoder." if k.startswith("fnet.") else "context_encoder."
        k = k.split(".", 1)[1]
        k = re.sub(r"^conv2\.", "conv.", k)
        k = re.sub(r"^conv1\.", "convnormrelu.0.", k)
        k = re.sub(r"^norm1\.", "convnormrelu.1.", k)
        k = re.sub(r"\.conv(\d)\.", r".convnormrelu\1.0.", k)
        k = re.sub(r"\.norm(\d)\.", r".convnormrelu\1.1.", k)
        return prefix + k
    if k.startswith("update_block.encoder."):
        k = k.removeprefix("update_block.encoder.")
        renames = {
            "convc1.": "convcorr1.0.",
            "convc2.": "convcorr2.0.",
            "convf1.": "convflow1.0.",
            "convf2.": "convflow2.0.",
            "conv.": "conv.0.",
        }
        for pv, tv in renames.items():
            if k.startswith(pv):
                return "update_block.motion_encoder." + tv + k.removeprefix(pv)
    m = __import__("re").match(r"update_block\.gru\.conv([zrq])(\d)\.(.*)", k)
    if m:
        gate, stage, rest = m.groups()
        return f"update_block.recurrent_block.convgru{stage}.conv{gate}.{rest}"
    if k.startswith("update_block.flow_head."):
        return k
    if k.startswith("update_block.mask.0."):
        return "mask_predictor.convrelu.0." + k.removeprefix("update_block.mask.0.")
    if k.startswith("update_block.mask.2."):
        return "mask_predictor.conv." + k.removeprefix("update_block.mask.2.")
    raise KeyError(key)


def test_torchvision_rename_roundtrip(replica):
    """torchvision-schema synthetic dict -> converter -> identical params."""
    from flowmap_tpu.flow.raft import convert_torchvision_state_dict

    sd = {
        k: v
        for k, v in replica.state_dict().items()
        if "num_batches_tracked" not in k
    }
    tv_sd = {_princeton_to_torchvision(k): v for k, v in sd.items()}
    assert len(tv_sd) == len(sd)

    direct = convert_torch_state_dict(sd)
    via_tv = convert_torchvision_state_dict(tv_sd)
    assert set(direct) == set(via_tv)
    for k in direct:
        np.testing.assert_array_equal(np.asarray(direct[k]), np.asarray(via_tv[k]))
