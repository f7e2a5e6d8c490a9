"""Pretraining-loop tests: generalizable backbone, flow-on-the-fly contract."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from flowmap_tpu.loss import LossFlowCfg
from flowmap_tpu.model import (
    BackboneMidasCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
)
from flowmap_tpu.training.pretrain import (
    PretrainTrainerCfg,
    init_pretrain_state,
    make_pretrain_step,
    run_pretrain,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def _setup():
    batch, flows, _ = make_scene(
        SyntheticSceneCfg(num_frames=4, image_shape=(32, 32))
    )
    model_cfg = ModelCfg(
        backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
        intrinsics=IntrinsicsSoftminCfg(
            num_procrustes_points=64, num_candidates=4, regression=None
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=64),
    )
    return batch, flows, model_cfg


def test_pretrain_step_updates_backbone():
    batch, flows, model_cfg = _setup()
    trainer_cfg = PretrainTrainerCfg(lr=1e-4, max_steps=2)
    state, optimizer = init_pretrain_state(model_cfg, trainer_cfg)
    step = make_pretrain_step(
        model_cfg,
        [LossFlowCfg()],
        optimizer,
        lambda b, shape: flows,
        jax.random.PRNGKey(0),
    )
    new_state, metrics = jax.jit(step)(state, batch, batch)
    assert np.isfinite(float(metrics["loss/total"]))
    # MiDaS weights must receive gradients (shared across clips).
    before = jax.tree_util.tree_leaves(state.params["backbone"])
    after = jax.tree_util.tree_leaves(new_state.params["backbone"])
    changed = any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before)
    )
    assert changed, "no gradient reached the backbone"
    assert int(new_state.step) == 1


def test_run_pretrain_loop():
    batch, flows, model_cfg = _setup()
    trainer_cfg = PretrainTrainerCfg(lr=1e-4, max_steps=4, val_check_interval=2)
    batches = itertools.repeat((batch, batch))
    seen = []
    state, info = run_pretrain(
        model_cfg,
        [LossFlowCfg()],
        trainer_cfg,
        batches,
        lambda b, shape: flows,
        on_validation=lambda s, step, m: seen.append(step),
    )
    assert seen == [2, 4]
    assert int(state.step) == 4
    assert len(info["history"]["loss/total"]) == 2


def test_raft_predictor_in_flow_paths():
    """RAFT is accepted everywhere the reference accepts it
    (`flowmap/flow/__init__.py:9-14`): pretrain flow_fn + subsample +
    compute_flows (random weights; numerics are covered by
    tests/test_raft.py)."""
    from flowmap_tpu.flow.common import compute_bidirectional_flow
    from flowmap_tpu.flow.predictors import FlowPredictorRaftCfg
    from flowmap_tpu.flow.raft import RaftPredictor

    batch, _, _ = make_scene(
        SyntheticSceneCfg(num_frames=3, image_shape=(128, 128))
    )
    predictor = RaftPredictor(
        FlowPredictorRaftCfg(num_flow_updates=2, max_batch_size=4)
    )
    flows = compute_bidirectional_flow(predictor, batch, (64, 64))
    assert flows.forward.shape == (1, 2, 64, 64, 2)
    assert flows.backward.shape == (1, 2, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(flows.forward)))

    from flowmap_tpu.subsample import _make_flow_fn

    fn = _make_flow_fn(FlowPredictorRaftCfg(num_flow_updates=2))
    assert isinstance(fn, RaftPredictor)
