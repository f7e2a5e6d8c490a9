"""Multi-device (frame-sharded) training tests on the virtual CPU mesh.

Correctness criterion (SURVEY.md §7.3 #5): a frame-sharded training step must
produce the same result as the single-device step — the pose chain is a
global prefix product, so distributed-scan correctness shows up directly in
the extrinsics and their gradients.
"""

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


@pytest.fixture(scope="module")
def setup():
    # 16 frames: divisible by the 8-device frame axis.
    batch, flows, _ = make_scene(
        SyntheticSceneCfg(num_frames=16, image_shape=(32, 48))
    )
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=200),
    )
    trainer_cfg = OverfitTrainerCfg(lr=1e-2, max_steps=5)
    state, optimizer = init_train_state(model_cfg, trainer_cfg, 16, (32, 48))
    step = make_train_step(
        model_cfg, [LossFlowCfg()], optimizer, jax.random.PRNGKey(7)
    )
    return batch, flows, state, step


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"


def test_sharded_step_matches_single_device(setup):
    batch, flows, state, step = setup

    # Single-device result.
    ref_state, ref_metrics = jax.jit(step)(state, batch, flows, None)

    # Frame-sharded over all 8 devices.
    mesh = make_mesh(n_data=1, n_frame=8)
    sharded_step = make_sharded_train_step(step, mesh, state, batch)
    batch_s = shard_batch(batch, mesh)
    flows_s = shard_flows(flows, mesh)
    out_state, out_metrics = sharded_step(state, batch_s, flows_s, None)

    np.testing.assert_allclose(
        float(out_metrics["loss/total"]), float(ref_metrics["loss/total"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_state.params["backbone"]["depth"]),
        np.asarray(ref_state.params["backbone"]["depth"]),
        atol=1e-5,
    )


def test_sharded_multi_step_stays_consistent(setup):
    batch, flows, state, step = setup
    mesh = make_mesh(n_data=1, n_frame=8)
    sharded_step = make_sharded_train_step(step, mesh, state, batch)
    batch_s = shard_batch(batch, mesh)
    flows_s = shard_flows(flows, mesh)

    ref = state
    shd = state
    jit_step = jax.jit(step)
    for _ in range(3):
        ref, ref_m = jit_step(ref, batch, flows, None)
        shd, shd_m = sharded_step(shd, batch_s, flows_s, None)
    np.testing.assert_allclose(
        float(shd_m["loss/total"]), float(ref_m["loss/total"]), rtol=1e-4
    )


def test_data_by_frame_mesh(setup):
    """A 2x4 (data, frame) mesh also compiles and runs (pretrain shape)."""
    batch, flows, state, step = setup
    mesh = make_mesh(n_data=2, n_frame=4)
    sharded_step = make_sharded_train_step(step, mesh, state, batch)
    out_state, out_metrics = sharded_step(
        state, shard_batch(batch, mesh), shard_flows(flows, mesh), None
    )
    assert np.isfinite(float(out_metrics["loss/total"]))


def test_pretrain_data_parallel():
    """Pretrain step sharded on the data axis: matches single device."""
    from flowmap_tpu.model import BackboneMidasCfg, IntrinsicsSoftminCfg
    from flowmap_tpu.training.pretrain import (
        PretrainTrainerCfg,
        init_pretrain_state,
        make_pretrain_step,
    )
    from flowmap_tpu.types import Batch, Flows
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch1, flows1, _ = make_scene(SyntheticSceneCfg(num_frames=4, image_shape=(32, 32)))
    # Batch of 4 clips (replicate the single scene).
    videos = jnp.tile(batch1.videos, (4, 1, 1, 1, 1))
    batch = Batch(videos=videos, indices=jnp.tile(batch1.indices, (4, 1)))
    flows = jax.tree_util.tree_map(lambda x: jnp.tile(x, (4,) + (1,) * (x.ndim - 1)), flows1)

    model_cfg = ModelCfg(
        backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
        intrinsics=IntrinsicsSoftminCfg(
            num_procrustes_points=32, num_candidates=4, regression=None
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=32),
    )
    state, optimizer = init_pretrain_state(model_cfg, PretrainTrainerCfg(lr=1e-4))
    step = make_pretrain_step(
        model_cfg, [LossFlowCfg()], optimizer, lambda b, s: flows, jax.random.PRNGKey(3)
    )

    ref_state, ref_metrics = jax.jit(step)(state, batch, batch)

    mesh = make_mesh(n_data=4, n_frame=2)
    data_sharded = NamedSharding(mesh, P("data"))
    batch_s = Batch(
        videos=jax.device_put(batch.videos, data_sharded),
        indices=jax.device_put(batch.indices, data_sharded),
    )
    out_state, out_metrics = jax.jit(step)(state, batch_s, batch_s)
    # Cross-device reduction order perturbs the fp32 mean slightly.
    np.testing.assert_allclose(
        float(out_metrics["loss/total"]), float(ref_metrics["loss/total"]), rtol=1e-3
    )
