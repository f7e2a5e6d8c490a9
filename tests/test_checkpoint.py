"""Checkpoint save/restore round-trips (orbax)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmap_tpu.loss import LossFlowCfg
from flowmap_tpu.model import (
    BackboneExplicitDepthCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsGroundTruthCfg,
    ModelCfg,
)
from flowmap_tpu.training.checkpoint import (
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    init_train_state,
    make_train_step,
)
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def _state():
    batch, flows, _ = make_scene(SyntheticSceneCfg(num_frames=4, image_shape=(16, 24)))
    model_cfg = ModelCfg(
        backbone=BackboneExplicitDepthCfg(initial_depth=1.0),
        intrinsics=IntrinsicsGroundTruthCfg(),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=64),
    )
    state, optimizer = init_train_state(model_cfg, OverfitTrainerCfg(lr=1e-2), 4, (16, 24))
    step = make_train_step(model_cfg, [LossFlowCfg()], optimizer, jax.random.PRNGKey(0))
    state, _ = jax.jit(step)(state, batch, flows, None)
    return state


def test_full_state_roundtrip(tmp_path):
    state = _state()
    save_checkpoint(tmp_path / "ckpt", state, step=1)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(tmp_path / "ckpt", zeroed)
    np.testing.assert_allclose(
        np.asarray(restored.params["backbone"]["depth"]),
        np.asarray(state.params["backbone"]["depth"]),
    )
    assert int(restored.step) == 1
    # Latest-step resolution works from the root dir.
    save_checkpoint(tmp_path / "ckpt", state.replace(step=jnp.asarray(5)), step=5)
    restored2 = restore_checkpoint(tmp_path / "ckpt", zeroed)
    assert int(restored2.step) == 5


def test_params_only_roundtrip(tmp_path):
    state = _state()
    save_params(tmp_path / "params", state.params)
    target = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    loaded = load_params(tmp_path / "params", target)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["weights"]),
        np.asarray(state.params["backbone"]["weights"]),
    )


def test_async_checkpoint_roundtrip(tmp_path):
    """save_checkpoint is async: the call returns before the write commits,
    wait_for_checkpoints() makes it durable, and restore sees the data
    (restore itself waits for pending writes)."""
    import jax.numpy as jnp

    from flowmap_tpu.training.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4)},
        "step": jnp.asarray(7),
    }
    save_checkpoint(tmp_path / "ckpt", state, 7)
    # No explicit wait: restore must block on the pending async write.
    restored = restore_checkpoint(
        tmp_path / "ckpt",
        {"params": {"w": jnp.zeros((3, 4))}, "step": jnp.asarray(0)},
    )
    assert float(restored["step"]) == 7
    assert float(restored["params"]["w"][2, 3]) == 11.0

    # Overlapping saves from one run commit in order and both survive.
    save_checkpoint(tmp_path / "ckpt", state, 8)
    save_checkpoint(
        tmp_path / "ckpt",
        {"params": {"w": jnp.ones((3, 4))}, "step": jnp.asarray(9)},
        9,
    )
    wait_for_checkpoints()
    latest = restore_checkpoint(
        tmp_path / "ckpt",
        {"params": {"w": jnp.zeros((3, 4))}, "step": jnp.asarray(0)},
    )
    assert float(latest["step"]) == 9
    # The earlier in-flight save was not cancelled by the later one.
    step8 = restore_checkpoint(
        tmp_path / "ckpt" / "8",
        {"params": {"w": jnp.zeros((3, 4))}, "step": jnp.asarray(0)},
    )
    assert float(step8["step"]) == 7  # saved `state` (step leaf value 7)
