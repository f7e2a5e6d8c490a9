"""Dense unbounded-displacement warp kernel (ops/pallas/dense_warp.py) vs
the grid_sample_2d reference, incl. the consistency-mask integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.ops.grid_sample import grid_sample_2d
from flowmap_tpu.ops.pallas.dense_warp import dense_warp_bilinear
from flowmap_tpu.ops.pallas.runtime import pallas_mode


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("shape", [(2, 3, 24, 40), (1, 3, 17, 29)])
def test_matches_grid_sample(shape, padding_mode):
    n, c, h, w = shape
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
    # Large displacements incl. far out-of-bounds (the kernel's raison d'etre).
    grid = jnp.asarray(
        rng.uniform(-1.8, 1.8, size=(n, h, w, 2)).astype(np.float32)
    )
    want = grid_sample_2d(img, grid, padding_mode=padding_mode)

    wh = jnp.asarray([w, h], jnp.float32)
    pixel_xy = ((grid + 1.0) * wh - 1.0) * 0.5
    with pallas_mode("force"):
        got = dense_warp_bilinear(img, pixel_xy, padding_mode)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # XLA fallback path agrees too.
    with pallas_mode("off"):
        got_xla = dense_warp_bilinear(img, pixel_xy, padding_mode)
    np.testing.assert_allclose(
        np.asarray(got_xla), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_backward_raises():
    img = jnp.ones((1, 3, 8, 8))
    xy = jnp.full((1, 8, 8, 2), 3.0)
    with pytest.raises(NotImplementedError, match="forward-only"):
        jax.grad(lambda im: dense_warp_bilinear(im, xy).sum())(img)


def test_consistency_mask_unchanged():
    """compute_consistency_mask through the new warp must equal the old
    grid_sample_2d formulation."""
    from flowmap_tpu.flow.common import compute_consistency_mask

    rng = np.random.default_rng(1)
    videos = jnp.asarray(rng.uniform(size=(1, 4, 3, 24, 32)).astype(np.float32))
    flow = jnp.asarray(
        rng.normal(scale=0.15, size=(1, 3, 24, 32, 2)).astype(np.float32)
    )
    got = compute_consistency_mask(videos, flow)

    # Old formulation inline.
    from flowmap_tpu.ops.geometry import sample_image_grid

    b, f, c, h, w = videos.shape
    source = videos[:, :-1].reshape(b * (f - 1), c, h, w)
    target = videos[:, 1:].reshape(b * (f - 1), c, h, w)
    source_xy, _ = sample_image_grid((h, w), dtype=videos.dtype)
    target_xy = source_xy + flow.reshape(b * (f - 1), h, w, 2)
    target_pixels = grid_sample_2d(
        target, target_xy * 2.0 - 1.0, padding_mode="zeros"
    )
    deltas = jnp.max(jnp.abs(source - target_pixels), axis=1)
    want = ((1.0 - deltas) ** 8).reshape(b, f - 1, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
