"""Flow machinery tests: consistency mask + rescale parity with the
reference formulas (torch oracle)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from flowmap_tpu.flow.common import (
    compute_bidirectional_flow,
    compute_consistency_mask,
    rescale_flow,
    rescale_mask,
)
from flowmap_tpu.types import Batch


def _torch_consistency_mask(videos: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Reference formula (`flow_predictor.py:60-80`)."""
    b, f, c, h, w = videos.shape
    source = torch.from_numpy(videos[:, :-1].reshape(-1, c, h, w))
    target = torch.from_numpy(videos[:, 1:].reshape(-1, c, h, w))
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    grid = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).astype(np.float32)
    target_xy = torch.from_numpy(grid)[None] + torch.from_numpy(
        flow.reshape(-1, h, w, 2)
    )
    target_pixels = F.grid_sample(
        target,
        target_xy * 2 - 1,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    )
    deltas = (source - target_pixels).abs().max(dim=1).values
    return ((1 - deltas) ** 8).reshape(b, f - 1, h, w).numpy()


def test_consistency_mask_matches_reference_formula():
    rng = np.random.default_rng(0)
    videos = rng.uniform(size=(1, 4, 3, 12, 16)).astype(np.float32)
    flow = (rng.uniform(size=(1, 3, 12, 16, 2)).astype(np.float32) - 0.5) * 0.2
    got = np.asarray(compute_consistency_mask(jnp.asarray(videos), jnp.asarray(flow)))
    want = _torch_consistency_mask(videos, flow)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rescale_flow_and_mask():
    rng = np.random.default_rng(1)
    flow = jnp.asarray(rng.normal(size=(1, 3, 8, 12, 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(1, 3, 8, 12)).astype(np.float32))
    flow2 = rescale_flow(flow, (16, 24))
    mask2 = rescale_mask(mask, (16, 24))
    assert flow2.shape == (1, 3, 16, 24, 2)
    assert mask2.shape == (1, 3, 16, 24)
    # Normalized flow values are resolution-invariant: means are preserved
    # (up to boundary effects).
    np.testing.assert_allclose(
        float(flow2.mean()), float(flow.mean()), atol=5e-3
    )


def test_bidirectional_flow_time_reversal():
    """The backward flow must be computed on the reversed video and flipped
    back (`flow_predictor.py:82-103`): with a predictor that returns a
    per-pair constant, the outputs land in the right temporal slots."""
    b, f, h, w = 1, 4, 8, 8
    videos = jnp.zeros((b, f, 3, h, w))
    batch = Batch(videos=videos, indices=jnp.arange(f)[None])

    def predictor(vid):
        # Flow value encodes the source frame's mean intensity ordering.
        n = vid.shape[1] - 1
        values = jnp.arange(n, dtype=jnp.float32) + 1
        return jnp.broadcast_to(
            values[None, :, None, None, None], (b, n, h, w, 2)
        ) * 0.01

    flows = compute_bidirectional_flow(predictor, batch, (h, w))
    fwd = np.asarray(flows.forward[0, :, 0, 0, 0])
    bwd = np.asarray(flows.backward[0, :, 0, 0, 0])
    np.testing.assert_allclose(fwd, [0.01, 0.02, 0.03], rtol=1e-5)
    # Reversed-video prediction flipped back: pair i gets value n - i.
    np.testing.assert_allclose(bwd, [0.03, 0.02, 0.01], rtol=1e-5)
