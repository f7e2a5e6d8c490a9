"""Shape-bucketed frame padding (utils/buckets.py): exactness of the padded
optimization + compile-amortization across a synthetic scene sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.loss import LossFlowCfg
from flowmap_tpu.model import (
    BackboneExplicitDepthCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsGroundTruthCfg,
    ModelCfg,
)
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    init_train_state,
    make_train_step,
)
from flowmap_tpu.utils.buckets import bucket_frames, pad_scene_to_bucket
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def test_bucket_rounding():
    assert bucket_frames(5, 8) == 8
    assert bucket_frames(8, 8) == 8
    assert bucket_frames(9, 8) == 16
    assert bucket_frames(7, None) == 7
    assert bucket_frames(7, 1) == 7


def _model_cfg():
    return ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=64),
    )


def test_padded_step_is_exact():
    """Loss and the real-frame parameter updates of the padded step must
    match the unpadded step (padded pairs are fully mask-excluded)."""
    f, (h, w) = 7, (16, 24)
    batch, flows, _ = make_scene(SyntheticSceneCfg(num_frames=f, image_shape=(h, w)))
    model_cfg = _model_cfg()
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=3)

    def run(batch_in, flows_in, num_frames):
        state, optimizer = init_train_state(
            model_cfg, trainer_cfg, num_frames, (h, w)
        )
        step = jax.jit(
            make_train_step(
                model_cfg, [LossFlowCfg()], optimizer, jax.random.PRNGKey(5)
            )
        )
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch_in, flows_in, None)
            losses.append(float(metrics["loss/total"]))
        return losses, state

    losses_ref, state_ref = run(batch, flows, f)

    padded_batch, padded_flows, f_real = pad_scene_to_bucket(batch, flows, 10)
    assert f_real == f and padded_batch.videos.shape[1] == 10
    assert padded_flows.forward.shape[1] == 9
    losses_pad, state_pad = run(padded_batch, padded_flows, 10)

    np.testing.assert_allclose(losses_pad, losses_ref, rtol=1e-5)
    # Real-frame depth parameters updated identically; padded-tail params
    # exist but never received gradient through an unmasked term.
    np.testing.assert_allclose(
        np.asarray(state_pad.params["backbone"]["depth"])[:f],
        np.asarray(state_ref.params["backbone"]["depth"]),
        atol=1e-6,
    )
    assert np.all(np.isfinite(np.asarray(state_pad.params["backbone"]["depth"])))


def test_sweep_shares_compiled_steps():
    """Across a sweep of scenes with varying frame counts, bucketing
    collapses the distinct step shapes from one-per-scene to one-per-bucket
    (= one XLA compile per bucket; shapes are what the jit cache keys on)."""
    frame_counts = [5, 6, 7, 9, 10, 11, 12, 13]
    raw = {f for f in frame_counts}
    bucketed = {bucket_frames(f, 8) for f in frame_counts}
    assert len(raw) == 8
    assert bucketed == {8, 16}

    # And the padded scenes really do produce identical step input shapes.
    h, w = 16, 24
    shapes = set()
    for f in frame_counts[:3]:  # 5, 6, 7 -> all bucket to 8
        batch, flows, _ = make_scene(
            SyntheticSceneCfg(num_frames=f, image_shape=(h, w))
        )
        b, fl, _ = pad_scene_to_bucket(batch, flows, 8)
        shapes.add(
            (b.videos.shape, fl.forward.shape, fl.forward_mask.shape)
        )
    assert len(shapes) == 1


def test_overfit_cli_bucketing(tmp_path):
    """CLI integration: trainer.frame_bucket pads the step but exports the
    real frame count."""
    import json

    from PIL import Image

    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.flow.predictors import save_flows
    from flowmap_tpu.overfit import overfit

    f, (h, w) = 6, (48, 64)
    batch, flows, _ = make_scene(SyntheticSceneCfg(num_frames=f, image_shape=(h, w)))
    images_dir = tmp_path / "images"
    images_dir.mkdir()
    for i, frame in enumerate(np.asarray(batch.videos[0])):
        arr = (frame.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(images_dir / f"{i:0>6}.png")
    save_flows(tmp_path / "flows.npz", flows)

    out_dir = tmp_path / "out"
    cfg = compose_config(
        "overfit",
        OverfitCfg,
        [
            f"dataset.images.root={images_dir}",
            "flow=precomputed",
            f"flow.path={tmp_path}/flows.npz",
            "model/backbone=explicit_depth",
            "model.backbone.initial_depth=1.0",
            "model/intrinsics=regressed",
            "model.intrinsics.initial_focal_length=1.1",
            "loss=[flow]",
            "trainer.max_steps=6",
            "trainer.val_check_interval=3",
            "trainer.frame_bucket=8",
            "cropping.image_shape=[48,64]",
            "cropping.patch_size=16",
            "cropping.flow_scale_multiplier=1",
            f"output_dir={out_dir}",
        ],
    )
    result = overfit(cfg)

    exports = np.load(out_dir / "exports.npz")
    assert exports["extrinsics"].shape[1] == f  # sliced back to real frames
    assert exports["depths"].shape[1] == f
    from flowmap_tpu.export.colmap import read_colmap_model

    _, _, names = read_colmap_model(out_dir / "colmap/sparse/0")
    assert len(names) == f
    assert np.isfinite(result["info"]["history"]["loss/total"]).all()


def test_bucket_refused_for_batch_bn(tmp_path, capsys):
    """model.backbone.bn=batch + frame_bucket must refuse to pad (padding
    is not exact through batch statistics) rather than silently change the
    trajectory."""
    from PIL import Image

    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.overfit import overfit

    f, (h, w) = 5, (32, 64)
    batch, flows, _ = make_scene(SyntheticSceneCfg(num_frames=f, image_shape=(h, w)))
    images_dir = tmp_path / "images"
    images_dir.mkdir()
    from flowmap_tpu.flow.predictors import save_flows

    for i, frame in enumerate(np.asarray(batch.videos[0])):
        arr = (frame.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(images_dir / f"{i:0>6}.png")
    save_flows(tmp_path / "flows.npz", flows)

    cfg = compose_config(
        "overfit",
        OverfitCfg,
        [
            f"dataset.images.root={images_dir}",
            "flow=precomputed",
            f"flow.path={tmp_path}/flows.npz",
            "model.backbone.pretrained=false",
            "model.backbone.mapping=exp",
            "model.backbone.bn=batch",
            "model.intrinsics.num_procrustes_points=256",
            "model.intrinsics.num_candidates=6",
            "model.extrinsics.num_points=64",
            "loss=[flow]",
            "trainer.max_steps=2",
            "trainer.val_check_interval=2",
            "trainer.frame_bucket=8",
            "cropping.image_shape=[32,64]",
            "cropping.patch_size=32",
            "cropping.flow_scale_multiplier=1",
            f"output_dir={tmp_path}/out",
        ],
    )
    result = overfit(cfg)
    out = capsys.readouterr().out
    assert "Frame bucket DISABLED" in out
    # Ran unpadded at the real frame count.
    assert np.asarray(result["state"].params["backbone"]["midas"]).size or True
    exports = np.load(tmp_path / "out/exports.npz")
    assert exports["depths"].shape[1] == f
