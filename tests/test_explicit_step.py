"""Explicit shard_map collectives as a selectable train-step path
(VERDICT r4 item 3 / SURVEY §7.1 step 10).

Three claims, all on the virtual 8-device CPU mesh:

1. The explicit path is step-equivalent to both the GSPMD sharded path and
   the single-device step (same loss, same parameter update).
2. The explicit primitives actually engage: the partitioned HLO of the
   explicit step contains the hand-written collective-permute (halo) and
   all-gather (distributed pose chain), and its collective mix differs from
   the GSPMD-partitioned step's.
3. Both modes are selectable through `make_sharded_train_step(collectives=)`.
"""

import collections
import re

import jax
import numpy as np
import pytest

from flowmap_tpu.loss import LossFlowCfg
from flowmap_tpu.model import (
    BackboneExplicitDepthCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsGroundTruthCfg,
    ModelCfg,
)
from flowmap_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    shard_flows,
)
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    init_train_state,
    make_train_step,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene

FRAMES, SHAPE = 16, (32, 48)


@pytest.fixture(scope="module")
def setup():
    batch, flows, _ = make_scene(
        SyntheticSceneCfg(num_frames=FRAMES, image_shape=SHAPE)
    )
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=200),
    )
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=5)
    state, optimizer = init_train_state(model_cfg, trainer_cfg, FRAMES, SHAPE)
    step = make_train_step(
        model_cfg, [LossFlowCfg()], optimizer, jax.random.PRNGKey(7)
    )
    return batch, flows, state, step


def _collective_counts(compiled_text: str) -> dict:
    ops = collections.Counter()
    for name in re.findall(
        r"\b(collective-permute|all-gather|all-reduce|all-to-all|reduce-scatter)"
        r"(?:-start)?\b",
        compiled_text,
    ):
        ops[name] += 1
    return dict(ops)


def test_explicit_step_matches_gspmd_and_single_device(setup):
    batch, flows, state, step = setup
    mesh = make_mesh(n_data=1, n_frame=8)
    batch_s, flows_s = shard_batch(batch, mesh), shard_flows(flows, mesh)

    ref_state, ref_metrics = jax.jit(step)(state, batch, flows, None)

    results = {}
    for mode in ("gspmd", "explicit"):
        sharded = make_sharded_train_step(
            step, mesh, state, batch, collectives=mode
        )
        out_state, out_metrics = sharded(state, batch_s, flows_s, None)
        results[mode] = (out_state, out_metrics)
        np.testing.assert_allclose(
            float(out_metrics["loss/total"]),
            float(ref_metrics["loss/total"]),
            rtol=1e-4,
            err_msg=f"mode={mode} loss diverged from single-device",
        )
        # atol accommodates the explicit pose chain's different (per-shard
        # scan + cross-shard offset) matmul association: benign
        # reassociation noise of order 1e-5 on O(1) parameters.
        np.testing.assert_allclose(
            np.asarray(out_state.params["backbone"]["depth"]),
            np.asarray(ref_state.params["backbone"]["depth"]),
            atol=5e-5,
            err_msg=f"mode={mode} update diverged from single-device",
        )

    # The two sharded paths agree with each other tightly too.
    np.testing.assert_allclose(
        np.asarray(results["explicit"][0].params["backbone"]["depth"]),
        np.asarray(results["gspmd"][0].params["backbone"]["depth"]),
        atol=5e-5,
    )


def test_explicit_collectives_present_in_hlo(setup):
    batch, flows, state, step = setup
    mesh = make_mesh(n_data=1, n_frame=8)
    batch_s, flows_s = shard_batch(batch, mesh), shard_flows(flows, mesh)

    texts = {}
    for mode in ("gspmd", "explicit"):
        sharded = make_sharded_train_step(
            step, mesh, state, batch, collectives=mode
        )
        lowered = sharded.lower(state, batch_s, flows_s, None)
        texts[mode] = lowered.compile().as_text()

    counts = {m: _collective_counts(t) for m, t in texts.items()}
    # The explicit step must contain the hand-written halo ppermute and the
    # pose-chain all-gather.
    assert counts["explicit"].get("collective-permute", 0) >= 1, counts
    assert counts["explicit"].get("all-gather", 0) >= 1, counts
    # And it must actually change the communication pattern vs GSPMD (if the
    # partitioner emitted the identical program, the mode would be a no-op).
    assert counts["explicit"] != counts["gspmd"], counts


def test_unknown_collectives_mode_rejected(setup):
    batch, flows, state, step = setup
    mesh = make_mesh(n_data=1, n_frame=8)
    with pytest.raises(ValueError, match="unknown collectives"):
        make_sharded_train_step(step, mesh, state, batch, collectives="nope")


def test_cli_with_explicit_collectives(tmp_path):
    """The shipped CLI path runs frame-sharded with explicit collectives
    end-to-end (trainer.sharding=auto engages on the 8-device test mesh at
    8 frames; trainer.collectives=explicit routes the pose chain + halo
    through parallel/collectives.py)."""
    import json

    from PIL import Image

    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.flow.predictors import save_flows
    from flowmap_tpu.overfit import overfit

    f, (h, w) = 8, (48, 64)
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
            "trainer.collectives=explicit",
            "cropping.image_shape=[48,64]",
            "cropping.patch_size=16",
            "cropping.flow_scale_multiplier=1",
            f"output_dir={out_dir}",
        ],
    )
    result = overfit(cfg)
    history = result["info"]["history"]["loss/total"]
    assert np.isfinite(history).all()
    assert history[-1] <= history[0]
    assert json.loads((out_dir / "runtime.json").read_text())["runtime"] > 0
