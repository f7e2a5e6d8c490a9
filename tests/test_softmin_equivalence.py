"""The rewritten softmin sweep must match the reference formulation exactly.

Oracle: the reference computation spelled out directly (unproject the first
two frames under EVERY candidate, align_surfaces per candidate, induced
backward flow — `flowmap/model/intrinsics/intrinsics_softmin.py:84-131`).
The production sweep factors the candidate scaling out of the unprojection
and sampling (see `_softmin_sweep`); both must produce identical candidate
errors and mixed intrinsics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowmap_tpu.model.backbone.backbone_explicit_depth import (
    BackboneExplicitDepthCfg,
    apply_explicit_depth,
    init_explicit_depth,
)
from flowmap_tpu.model.intrinsics.intrinsics import (
    IntrinsicsSoftminCfg,
    _softmin_sweep,
)
from flowmap_tpu.ops.geometry import (
    compute_backward_flow,
    focal_lengths_to_intrinsics,
    sample_image_grid,
    unproject,
)
from flowmap_tpu.ops.surface import align_surfaces
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def _reference_sweep(cfg, batch, flows, backbone_output, key):
    """Direct transcription of the reference softmin computation."""
    b, f, _, h, w = batch.videos.shape
    n = cfg.num_candidates
    candidates = jnp.linspace(cfg.min_focal_length, cfg.max_focal_length, n)
    candidate_k = focal_lengths_to_intrinsics(candidates, (h, w))
    indices = jax.random.permutation(key, h * w)[: cfg.num_procrustes_points]

    xy, _ = sample_image_grid((h, w))
    depths2 = jnp.repeat(backbone_output.depths[:, :2], n, axis=0)
    k_bn = jnp.tile(candidate_k, (b, 1, 1))[:, None, None, None]
    surfaces = unproject(xy, depths2, k_bn)

    flows_bwd01 = jnp.repeat(flows.backward[:, :1], n, axis=0)
    weights01 = jnp.repeat(backbone_output.weights[:, :1], n, axis=0)
    extrinsics = align_surfaces(surfaces, flows_bwd01, weights01, indices)

    surfaces_sub = surfaces.reshape(b * n, 2, h * w, 3)[:, :, indices]
    k_pair = jnp.tile(candidate_k, (b, 1, 1))[:, None].repeat(2, axis=1)
    xy_flowed = compute_backward_flow(surfaces_sub, extrinsics, k_pair)
    xy_flowed = xy_flowed.reshape(b, n, -1, 2)

    xy_sub = xy.reshape(h * w, 2)[indices]
    flow = xy_flowed - xy_sub
    flow_gt = flows.backward[:, :1].reshape(b, 1, h * w, 2)[:, :, indices]
    pixel_weights = backbone_output.weights[:, :1].reshape(b, 1, h * w, 1)[
        :, :, indices
    ]
    error = jnp.sum(jnp.abs((flow - flow_gt) * pixel_weights), axis=(-1, -2))

    softmin_weights = jax.nn.softmax(
        -(error - jnp.min(error, axis=1, keepdims=True)) * 10.0, axis=1
    )
    mixed = jnp.einsum("bn,nij->bij", softmin_weights, candidate_k)
    return mixed, error


def test_factored_sweep_matches_reference_formulation():
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=4, image_shape=(32, 48))
    )
    bb_cfg = BackboneExplicitDepthCfg(initial_depth=1.0)
    bb = apply_explicit_depth(
        bb_cfg, init_explicit_depth(bb_cfg, 4, (32, 48)), batch, flows
    )
    # Make the depth nontrivial.
    bb = bb.replace(depths=depths, weights=bb.weights * 0.9 + 0.05)

    cfg = IntrinsicsSoftminCfg(
        num_procrustes_points=256, num_candidates=12, regression=None
    )
    key = jax.random.PRNGKey(7)

    got_k, _ = _softmin_sweep(
        cfg,
        batch.videos.shape[1],
        flows.backward[:, 0],
        bb.depths[:, :2],
        bb.weights[:, 0],
        key,
    )
    want_mixed, _ = _reference_sweep(cfg, batch, flows, bb, key)

    np.testing.assert_allclose(
        np.asarray(got_k[:, 0]), np.asarray(want_mixed), rtol=1e-4, atol=1e-5
    )
