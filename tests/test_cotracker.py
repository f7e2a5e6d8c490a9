"""CoTracker port: oracle parity vs an independent torch replica, converter
key coverage at full w8 scale, and the predictor's segment plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flowmap_tpu.tracking.cotracker_net import (
    CoTrackerNetCfg,
    convert_cotracker_state_dict,
    cotracker_init,
    track_points,
)

from tests.torch_cotracker_replica import CoTrackerReplica

TINY = dict(
    window_len=4,
    stride=4,
    latent_dim=32,
    corr_levels=2,
    corr_radius=1,
    hidden_size=64,
    num_heads=4,
    time_depth=2,
    space_depth=1,
    iters=2,
    flow_emb_dim=8,
)


@pytest.fixture(scope="module")
def tiny_pair():
    """Replica + converted params with a DAMPED coordinate head.

    With random (untrained) weights the refine loop is chaotic: coordinate
    deltas are O(1) feature pixels and feed back into the bilinear sampling
    positions, so any op-level 1e-6 difference amplifies ~30x per window
    (verified: every primitive — fnet, correlation sampling, one full window
    — agrees to <=5e-4; only multi-window composition diverges). Scaling the
    delta-xy rows of the flow head makes the fixed-point contractive, like a
    trained checkpoint, while still exercising every code path.
    """
    torch.manual_seed(0)
    replica = CoTrackerReplica(**TINY).eval()
    with torch.no_grad():
        replica.updateformer.flow_head.weight[:2] *= 0.02
        replica.updateformer.flow_head.bias[:2] *= 0.02
    cfg = CoTrackerNetCfg(**TINY)
    sd = {k: v.numpy() for k, v in replica.state_dict().items()}
    params = convert_cotracker_state_dict(sd, cfg)
    return replica, cfg, params


def test_single_window_parity():
    """One window, undamped weights: strict parity of the refinement loop."""
    torch.manual_seed(0)
    replica = CoTrackerReplica(**TINY).eval()
    cfg = CoTrackerNetCfg(**TINY)
    sd = {k: v.numpy() for k, v in replica.state_dict().items()}
    params = convert_cotracker_state_dict(sd, cfg)

    torch.manual_seed(3)
    video_t = torch.rand(TINY["window_len"], 3, 32, 48)
    queries_t = torch.rand(9, 2) * 0.8 + 0.1

    with jax.default_matmul_precision("highest"):
        xy_j, vis_j = track_points(
            params,
            cfg,
            jnp.asarray(video_t.numpy()),
            jnp.asarray(queries_t.numpy()),
            query_frame=0,
        )
    xy_t, vis_t = replica.track(video_t, queries_t)

    np.testing.assert_allclose(
        np.asarray(xy_j), xy_t.numpy(), atol=2e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(vis_j), vis_t.numpy(), atol=2e-3, rtol=0
    )


def test_track_parity(tiny_pair):
    replica, cfg, params = tiny_pair
    torch.manual_seed(1)
    video_t = torch.rand(10, 3, 32, 48)
    queries_t = torch.rand(9, 2) * 0.8 + 0.1

    with jax.default_matmul_precision("highest"):
        xy_j, vis_j = track_points(
            params,
            cfg,
            jnp.asarray(video_t.numpy()),
            jnp.asarray(queries_t.numpy()),
            query_frame=0,
        )
    xy_t, vis_t = replica.track(video_t, queries_t)

    np.testing.assert_allclose(
        np.asarray(xy_j), xy_t.numpy(), atol=1e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(vis_j), vis_t.numpy(), atol=1e-3, rtol=0
    )


def test_backward_tracking_parity(tiny_pair):
    """query_frame > 0: the prefix comes from a time-reversed pass."""
    replica, cfg, params = tiny_pair
    torch.manual_seed(2)
    video_t = torch.rand(7, 3, 32, 32)
    queries_t = torch.rand(4, 2) * 0.8 + 0.1
    qf = 3

    with jax.default_matmul_precision("highest"):
        xy_j, vis_j = track_points(
            params,
            cfg,
            jnp.asarray(video_t.numpy()),
            jnp.asarray(queries_t.numpy()),
            query_frame=qf,
        )

    xy_f, vis_f = replica.track(video_t[qf:], queries_t)
    xy_b, vis_b = replica.track(torch.flip(video_t[: qf + 1], (0,)), queries_t)
    xy_t = torch.cat([torch.flip(xy_b[1:], (0,)), xy_f])
    vis_t = torch.cat([torch.flip(vis_b[1:], (0,)), vis_f])

    np.testing.assert_allclose(
        np.asarray(xy_j), xy_t.numpy(), atol=1e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(vis_j), vis_t.numpy(), atol=1e-3, rtol=0
    )


def test_converter_key_coverage_full_scale():
    """Every tensor of a full-size w8 torch tree lands in the JAX tree with
    the shape the JAX init produces (and nothing is silently dropped)."""
    torch.manual_seed(0)
    replica = CoTrackerReplica()  # w8 defaults
    sd = {k: v.numpy() for k, v in replica.state_dict().items()}
    converted = convert_cotracker_state_dict(sd)
    expected = cotracker_init(jax.random.PRNGKey(0))

    conv_leaves = jax.tree_util.tree_leaves_with_path(converted)
    exp_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(expected)
    }
    assert len(conv_leaves) == len(exp_paths)
    for path, leaf in conv_leaves:
        assert exp_paths[jax.tree_util.keystr(path)] == leaf.shape, path
    # All torch tensors were consumed (instance/layer norms carry none).
    n_torch = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert n_torch == len(conv_leaves)


def test_generate_video_tracks_structure():
    from flowmap_tpu.tracking.cotracker import generate_video_tracks
    from flowmap_tpu.tracking.tracking import (
        TrackPrecomputationCfg,
        TrackPredictorCoTrackerCfg,
        segment_windows,
    )
    from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene

    batch, _, _ = make_scene(
        SyntheticSceneCfg(num_frames=9, image_shape=(32, 32))
    )
    cfg = TrackPredictorCoTrackerCfg(grid_size=3, similarity_threshold=10.0)
    pre = TrackPrecomputationCfg(interval=4, radius=2)

    tiny = CoTrackerNetCfg(**TINY)
    tracks = generate_video_tracks(
        batch, cfg, pre, params=cotracker_init(jax.random.PRNGKey(0), tiny),
        net_cfg=tiny,
    )

    windows = segment_windows(9, 4, 2)
    assert len(tracks) == len(windows)
    for t, (start, stop) in zip(tracks, windows):
        assert t.start_frame == start
        assert t.xy.shape == (1, stop - start, 9, 2)
        assert t.visibility.shape == (1, stop - start, 9)
        assert t.visibility.dtype == jnp.bool_
        assert bool(jnp.all(jnp.isfinite(t.xy)))


def test_missing_checkpoint_refuses():
    from flowmap_tpu.tracking.cotracker import load_params
    from flowmap_tpu.tracking.tracking import TrackPredictorCoTrackerCfg

    with pytest.raises(ValueError, match="checkpoint"):
        load_params(TrackPredictorCoTrackerCfg())
