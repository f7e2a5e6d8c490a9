"""End-to-end tests of the subsample CLI path (frames dir -> pairwise flow ->
flow-spaced frame selection). Parity: `flowmap/subsample.py:42-156`."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from flowmap_tpu.subsample import SubsampleCfg, subsample, subsample_frames
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("frames")
    batch, _, _ = make_scene(
        SyntheticSceneCfg(num_frames=12, image_shape=(32, 48))
    )
    videos = np.asarray(batch.videos[0])  # (f, 3, h, w)
    for i, frame in enumerate(videos):
        arr = (frame.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"frame_{i:06d}.png")
    return root


def test_subsample_cli_end_to_end(frames_dir, tmp_path):
    """Full pipeline with a real (random-init) GMFlow predictor."""
    out = tmp_path / "subsampled"
    cfg = SubsampleCfg(
        in_path=frames_dir,
        out_path=out,
        target_num_frames=6,
        flow_resolution=32 * 48,
    )
    subsample(cfg)

    picked = sorted(p.name for p in out.iterdir())
    assert len(picked) == 6
    available = {p.name for p in frames_dir.iterdir()}
    assert set(picked) <= available
    # Selected frames are valid images of the original size.
    img = np.asarray(Image.open(out / picked[0]))
    assert img.shape[:2] == (32, 48)


def test_subsample_copies_when_few_frames(frames_dir, tmp_path):
    """<= target frames: the whole directory is copied (`subsample.py:116-120`)."""
    out = tmp_path / "all"
    subsample_frames(
        predict_flow=None,  # must not be called
        full_video_path=frames_dir,
        subsampled_path=out,
        target_num_frames=50,
        flow_resolution=32 * 48,
    )
    assert sorted(p.name for p in out.iterdir()) == sorted(
        p.name for p in frames_dir.iterdir()
    )


def test_subsample_flow_spaced_selection(frames_dir, tmp_path):
    """With a fake predictor concentrating flow in one region, selection is
    denser there (greedy cumulative-flow spacing, `subsample.py:134-156`)."""
    frame_names = sorted(p.name for p in frames_dir.iterdir())

    calls = {"i": 0}
    # Flow magnitude large for the first 3 pairs, tiny afterwards.
    mags = [4.0, 4.0, 4.0] + [0.1] * (len(frame_names) - 4)

    def fake_flow(videos):
        _, _, _, h, w = videos.shape
        mag = mags[calls["i"]]
        calls["i"] += 1
        return jnp.full((1, 1, h, w, 2), mag / np.sqrt(2.0))

    out = tmp_path / "spaced"
    subsample_frames(
        predict_flow=fake_flow,
        full_video_path=frames_dir,
        subsampled_path=out,
        target_num_frames=5,
        flow_resolution=32 * 48,
    )
    picked = sorted(p.name for p in out.iterdir())
    assert len(picked) == 5
    # The high-flow head (first 4 frames) must contribute multiple picks.
    head_picks = sum(1 for n in picked if n in frame_names[:4])
    assert head_picks >= 2
