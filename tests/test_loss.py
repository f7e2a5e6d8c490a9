"""Loss-layer golden tests: mappings vs torch huber, gating, normalization."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg, compute_losses
from flowmap_tpu.loss.mapping import MappingCfg, apply_mapping, fix_aspect_ratio
from flowmap_tpu.ops.geometry import sample_image_grid, unproject
from flowmap_tpu.types import ModelOutput
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


class TestMappings:
    def test_huber_matches_torch(self):
        """Reference: huber(norm)/delta with torch semantics
        (`mapping_huber.py:18-34`)."""
        rng = np.random.default_rng(0)
        a = rng.normal(scale=0.02, size=(50, 2)).astype(np.float32)
        b = rng.normal(scale=0.02, size=(50, 2)).astype(np.float32)
        h, w = 30, 40
        delta = 0.01

        got = np.asarray(
            apply_mapping(MappingCfg("huber", delta), jnp.asarray(a), jnp.asarray(b), (h, w))
        )

        af = np.asarray(fix_aspect_ratio(jnp.asarray(a), (h, w)))
        bf = np.asarray(fix_aspect_ratio(jnp.asarray(b), (h, w)))
        norm = torch.from_numpy(np.linalg.norm(af - bf, axis=-1))
        want = (
            F.huber_loss(norm, torch.zeros_like(norm), reduction="none", delta=delta)
            / delta
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_l1_l2(self):
        a = jnp.asarray([[3.0, 4.0]])
        b = jnp.zeros((1, 2))
        # Square image -> no aspect correction.
        np.testing.assert_allclose(
            float(apply_mapping(MappingCfg("l1"), a, b, (10, 10))[0]), 5.0, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(apply_mapping(MappingCfg("l2"), a, b, (10, 10))[0]), 12.5, rtol=1e-6
        )

    def test_aspect_correction_makes_distance_isotropic(self):
        # One pixel of displacement in x vs y must map to the same distance.
        h, w = 20, 80
        dx = jnp.asarray([[1.0 / w, 0.0]])
        dy = jnp.asarray([[0.0, 1.0 / h]])
        zero = jnp.zeros((1, 2))
        mx = float(apply_mapping(MappingCfg("l1"), dx, zero, (h, w))[0])
        my = float(apply_mapping(MappingCfg("l1"), dy, zero, (h, w))[0])
        np.testing.assert_allclose(mx, my, rtol=1e-5)


class TestComputeLosses:
    @pytest.fixture()
    def perfect_scene(self):
        batch, flows, depths = make_scene(
            SyntheticSceneCfg(num_frames=6, image_shape=(24, 32))
        )
        h, w = 24, 32
        xy, _ = sample_image_grid((h, w))
        surfaces = unproject(xy, depths, batch.intrinsics[:, :, None, None])
        output = ModelOutput(
            depths=depths,
            surfaces=surfaces,
            intrinsics=batch.intrinsics,
            extrinsics=batch.extrinsics,
            backward_correspondence_weights=jnp.ones((1, 5, h, w)),
        )
        return batch, flows, output

    def test_flow_loss_zero_at_ground_truth(self, perfect_scene):
        batch, flows, output = perfect_scene
        total, individual = compute_losses(
            [LossFlowCfg()], flows, None, output, 10, (24, 32)
        )
        assert float(total) < 1e-4, float(total)

    def test_flow_loss_positive_when_wrong(self, perfect_scene):
        batch, flows, output = perfect_scene
        wrong = output.replace(depths=output.depths * 1.3,
                               surfaces=output.surfaces * 1.3)
        total, _ = compute_losses([LossFlowCfg()], flows, None, wrong, 10, (24, 32))
        assert float(total) > 1e-3

    def test_enable_after_gate(self, perfect_scene):
        batch, flows, output = perfect_scene
        from flowmap_tpu.utils.synthetic import make_tracks

        tracks = make_tracks(batch, output.depths, num_points=16)
        for step, expect_on in ((10, False), (80, True)):
            total, individual = compute_losses(
                [LossTrackingCfg(enable_after=50)],
                flows,
                tracks,
                output.replace(depths=output.depths * 1.2,
                               surfaces=output.surfaces * 1.2),
                step,
                (24, 32),
            )
            if expect_on:
                assert float(individual["tracking"]) > 0
            else:
                assert float(individual["tracking"]) == 0.0


class TestPackedTrackLossEquivalence:
    def test_packed_fused_matches_ragged(self):
        """The fused packed track loss (one folded-projection matmul) must
        match the ragged reference-semantics path on identical segments."""
        from flowmap_tpu.tracking import pack_tracks
        from flowmap_tpu.utils.synthetic import make_track_segments

        batch, flows, depths = make_scene(
            SyntheticSceneCfg(num_frames=12, image_shape=(24, 32))
        )
        h, w = 24, 32
        xy, _ = sample_image_grid((h, w))
        surfaces = unproject(xy, depths, batch.intrinsics[:, :, None, None])
        # Perturb so the loss is nonzero (GT geometry would give ~0).
        output = ModelOutput(
            depths=depths * 1.2,
            surfaces=surfaces * 1.2,
            intrinsics=batch.intrinsics,
            extrinsics=batch.extrinsics,
            backward_correspondence_weights=jnp.ones((1, 11, h, w)),
        )
        segments = make_track_segments(
            batch, depths, interval=4, radius=3, grid_size=5
        )
        packed = pack_tracks(segments, 12)

        cfgs = [LossTrackingCfg(enable_after=0)]
        ragged_total, _ = compute_losses(cfgs, flows, segments, output, 10, (h, w))
        packed_total, _ = compute_losses(cfgs, flows, packed, output, 10, (h, w))
        assert float(ragged_total) > 0
        np.testing.assert_allclose(
            float(packed_total), float(ragged_total), rtol=2e-4
        )
