"""Tracking subsystem tests: segments, caching, packing, flow-chain tracker."""

import jax.numpy as jnp
import numpy as np

from flowmap_tpu.tracking import (
    load_tracks,
    pack_tracks,
    save_tracks,
    segment_windows,
)
from flowmap_tpu.tracking.tracker_flow_chain import (
    TrackPredictorFlowChainCfg,
    generate_video_tracks_flow_chain,
)
from flowmap_tpu.types import Tracks
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def test_segment_windows_match_reference_structure():
    # f=23, interval 5, radius 3 -> centers 0,5,10,15,20.
    wins = segment_windows(23, 5, 3)
    assert wins == [(0, 4), (2, 9), (7, 14), (12, 19), (17, 23)]


def test_save_load_roundtrip(tmp_path):
    tracks = [
        Tracks(
            xy=jnp.asarray(np.random.rand(1, 4, 7, 2), jnp.float32),
            visibility=jnp.asarray(np.random.rand(1, 4, 7) > 0.5),
            start_frame=3,
        )
    ]
    save_tracks(tmp_path / "t.npz", tracks)
    loaded = load_tracks(tmp_path / "t.npz")
    assert len(loaded) == 1
    np.testing.assert_allclose(np.asarray(loaded[0].xy), np.asarray(tracks[0].xy))
    assert loaded[0].start_frame == 3


def test_flow_chain_tracker_recovers_exact_tracks():
    """On a rigid scene with exact flow, chained tracks must coincide with
    the geometric ground-truth tracks wherever visible."""
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=12, image_shape=(64, 96))
    )
    cfg = TrackPredictorFlowChainCfg(grid_size=8, cycle_threshold=0.05)
    segments = generate_video_tracks_flow_chain(
        batch, flows, cfg, interval=6, radius=4
    )
    assert len(segments) == 2

    # Geometric ground truth: project each segment's center-frame queries.
    from flowmap_tpu.utils.synthetic import _exact_tracks, _np_grid, _np_unproject

    poses = np.asarray(batch.extrinsics[0])
    k = np.asarray(batch.intrinsics[0, 0])
    d = np.asarray(depths[0])
    f, h, w = d.shape
    xy = _np_grid(h, w)
    surfaces = _np_unproject(xy, d, k)

    for segment, center in zip(segments, (0, 6)):
        start = segment.start_frame
        stop = start + segment.xy.shape[1]
        g = 8
        gx = (np.arange(g) + 0.5) / g
        query = np.stack(np.meshgrid(gx, gx, indexing="xy"), -1).reshape(-1, 2)
        want_xy, _ = _exact_tracks(
            poses[start:stop], k, surfaces[start:stop],
            query.astype(np.float32), center - start,
        )
        got_xy = np.asarray(segment.xy[0])
        got_vis = np.asarray(segment.visibility[0])
        err = np.abs(got_xy - want_xy)[got_vis]
        assert got_vis.mean() > 0.5, "tracker marked almost everything occluded"
        assert err.max() < 0.01, f"chained tracks deviate: {err.max()}"


def test_pack_tracks_shapes():
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=10, image_shape=(32, 48))
    )
    cfg = TrackPredictorFlowChainCfg(grid_size=4)
    segments = generate_video_tracks_flow_chain(batch, flows, cfg, 4, 3)
    packed = pack_tracks(segments, 10)
    s = len(segments)
    assert packed.xy.shape[1] == s
    assert packed.visibility.shape == packed.xy.shape[:-1]
    assert packed.starts.shape == (s,)
    assert int(packed.starts.max()) + packed.xy.shape[2] <= 10
