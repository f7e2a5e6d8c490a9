"""End-to-end ingestion of a format-exact Lightning reference checkpoint
(VERDICT r4 item 5): build the fixture -> `load_reference_checkpoint` ->
overfit CLI initialized from it -> COLMAP export -> ATE evaluation.

The real published checkpoint is unreachable (zero egress); the fixture in
`lightning_ckpt_fixture.py` replicates its exact key layout including the
`backbone.midas_out.*` detached head (`backbone_midas.py:55-56`), BN
`num_batches_tracked` buffers, frozen `flow_predictor.*` keys, and Adam
`optimizer_states`.
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.lightning_ckpt_fixture import make_reference_lightning_ckpt


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "initialization_synthetic.ckpt"
    make_reference_lightning_ckpt(path)
    return path


def _tree_spec(tree):
    """(path, shape) set for structural comparison."""
    out = set()

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))
        elif node is not None:
            out.add((path, tuple(np.shape(node))))

    walk(tree, ())
    return out


def test_load_reference_checkpoint_structure(ckpt_path):
    """The converted tree must be a structural subtree of the model's own
    init params (so the weights-only non-strict merge is total on the
    backbone/intrinsics it carries)."""
    import jax

    from flowmap_tpu.model.backbone.midas_net import midas_small_init
    from flowmap_tpu.utils.torch_convert import load_reference_checkpoint

    params = load_reference_checkpoint(ckpt_path)

    init_midas = midas_small_init(jax.random.PRNGKey(0), fold_bn=True)
    loaded = _tree_spec(params["backbone"]["midas"])
    expected = _tree_spec(init_midas)
    assert loaded == expected, (
        f"midas tree mismatch: missing={sorted(expected - loaded)[:5]} "
        f"extra={sorted(loaded - expected)[:5]}"
    )

    # Head actually came from the midas_out keys (values, not just layout):
    # conv1 of the head is scratch.output_conv.0 == midas_out.0.
    ckpt = torch.load(ckpt_path, weights_only=False)
    head_w = ckpt["state_dict"]["model.backbone.midas_out.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["midas"]["head"]["conv1"]["kernel"]),
        head_w.transpose(2, 3, 1, 0),
        rtol=1e-6,
    )

    mlp = params["backbone"]["corr_weighter"]
    assert [tuple(layer["kernel"].shape) for layer in mlp] == [
        (128, 128), (128, 64), (64, 1),
    ]
    assert float(params["intrinsics"]["focal_length"]) == pytest.approx(1.2345)


def test_checkpoint_to_overfit_to_ate(ckpt_path, tmp_path):
    """Full chain at toy scale: CLI overfit initialized from the Lightning
    checkpoint, export, check_model + ATE-vs-GT (the reference protocol of
    `paper/common.py:163-221` with synthetic ground truth)."""
    from PIL import Image

    from flowmap_tpu.config import OverfitCfg, compose_config
    from flowmap_tpu.evaluation.evaluate import (
        check_model,
        evaluate_scene_dir,
    )
    from flowmap_tpu.flow.predictors import save_flows
    from flowmap_tpu.overfit import overfit
    from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene

    scene_root = tmp_path / "scene"
    (scene_root / "images").mkdir(parents=True)
    batch, flows, _ = make_scene(
        SyntheticSceneCfg(num_frames=6, image_shape=(64, 96))
    )
    for i, frame in enumerate(np.asarray(batch.videos[0])):
        arr = (frame.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(scene_root / "images" / f"{i:0>6}.png")
    save_flows(scene_root / "flows.npz", flows)

    out_dir = tmp_path / "out"
    cfg = compose_config(
        "overfit",
        OverfitCfg,
        [
            f"dataset.images.root={scene_root}/images",
            "flow=precomputed",
            f"flow.path={scene_root}/flows.npz",
            # MiDaS with folded BN: the layout the converted (BN-folded)
            # checkpoint params merge into.
            "model.backbone.pretrained=false",
            "model.backbone.bn=folded",
            "model.backbone.mapping=exp",
            # Toy-scale softmin budget (8192 points > the 64x96 pixel count).
            "model.intrinsics.num_procrustes_points=512",
            "model.intrinsics.num_candidates=12",
            "model.extrinsics.num_points=128",
            "loss=[flow]",
            "trainer.max_steps=4",
            "trainer.val_check_interval=2",
            "cropping.image_shape=[64,96]",
            "cropping.patch_size=32",
            "cropping.flow_scale_multiplier=1",
            f"checkpoint.load={ckpt_path}",
            f"output_dir={out_dir}",
        ],
    )
    result = overfit(cfg)

    # The checkpoint was actually loaded into the train state: the head
    # conv1 kernel of the final params must match the fixture's midas_out.0
    # (4 tiny steps at lr 3e-5 cannot move it visibly at this tolerance
    # vs a random init, which would differ at O(0.1)).
    ckpt = torch.load(ckpt_path, weights_only=False)
    head_w = ckpt["state_dict"]["model.backbone.midas_out.0.weight"].numpy()
    final_head = np.asarray(
        result["state"].params["backbone"]["midas"]["head"]["conv1"]["kernel"]
    )
    assert np.max(np.abs(final_head - head_w.transpose(2, 3, 1, 0))) < 1e-2

    model_check = check_model(out_dir / "colmap/sparse/0")
    assert model_check["ok"], model_check
    assert model_check["num_images"] == 6

    scene_metrics = evaluate_scene_dir(
        out_dir, gt_extrinsics=np.asarray(batch.extrinsics[0])
    )
    assert np.isfinite(scene_metrics["ate_vs_gt"])
    assert json.loads((out_dir / "runtime.json").read_text())["runtime"] > 0
