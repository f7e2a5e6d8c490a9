"""Weight-converter validation against a torch oracle (VERDICT r1 item 5).

The real MiDaS_small checkpoint is unreachable in this zero-egress image, so
the oracle is `torch_midas_replica.MidasSmallTorch`: the exact hub module
tree with random weights. The converter must (a) consume the full state_dict
(key coverage) and (b) produce a JAX forward that matches torch eval-mode
numerics (BN folding, conv layout, TF-SAME padding, align_corners upsamples).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flowmap_tpu.utils.torch_convert import convert_midas_small


@pytest.fixture(scope="module")
def replica():
    from tests.torch_midas_replica import MidasSmallTorch

    torch.manual_seed(0)
    model = MidasSmallTorch()
    # Random-but-sane BN statistics so folding is exercised nontrivially.
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    model.eval()
    return model


def test_converter_key_coverage(replica):
    sd = replica.state_dict()
    consumed = set()

    class Tracker(dict):
        def __getitem__(self, key):
            consumed.add(key)
            return sd[key]

        def __contains__(self, key):
            return key in sd

    convert_midas_small(Tracker())
    leftovers = {
        k
        for k in sd
        if k not in consumed and "num_batches_tracked" not in k
    }
    assert not leftovers, f"converter ignored checkpoint keys: {sorted(leftovers)[:10]}"


def test_converted_forward_matches_torch(replica):
    import jax
    import jax.numpy as jnp

    from flowmap_tpu.model.backbone.midas_net import MidasSmall

    params = convert_midas_small(replica.state_dict())
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 96)).astype(np.float32)

    with torch.no_grad():
        head_t, feats_t = replica(torch.from_numpy(x))

    # The reference runs torch at float32_matmul_precision("highest")
    # (flowmap/misc/common_training_setup.py:21); JAX's default f32 conv
    # path is reduced-precision, so parity needs HIGHEST here.
    with jax.default_matmul_precision("highest"):
        head_j, feats_j = jax.jit(
            lambda p, v: MidasSmall.apply_split(p, v, mapping="original")
        )(params, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(feats_j), feats_t.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(head_j), head_t.numpy(), atol=1e-4, rtol=1e-4
    )
