"""Per-scene overfitting loop — the reference's hot path, fully jitted.

Parity: `flowmap/model/model_wrapper_overfit.py` + Lightning Trainer
(`flowmap/overfit.py:94-112`), redesigned for XLA:

- One optimization step = one compiled function (model forward -> losses ->
  grads -> Adam), with batch/flows/tracks passed as device-resident pytrees.
- Steps are driven in chunks of `val_check_interval` through `lax.scan`, so
  the 2000-step loop costs ~40 dispatches instead of 2000 (dispatch latency
  matters more on TPU than GPU).
- The two-stage softmin->regressed intrinsics schedule (including the focal
  handoff) lives inside the compiled step (see
  `flowmap_tpu/model/intrinsics/intrinsics.py`) — no retracing at the stage
  boundary.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..loss.loss import LossCfg, compute_losses
from ..model.intrinsics.intrinsics import maybe_handoff_focal
from ..model.model import ModelCfg, ModelState, forward, init_model
from ..types import Batch, Flows, Tracks


@dataclass(frozen=True)
class OverfitTrainerCfg:
    lr: float = 3e-5
    max_steps: int = 2000
    val_check_interval: int = 50
    seed: int = 0


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    model_state: ModelState
    step: jax.Array  # int32 scalar


def init_train_state(
    model_cfg: ModelCfg,
    trainer_cfg: OverfitTrainerCfg,
    num_frames: int,
    image_shape: tuple[int, int],
) -> tuple[TrainState, optax.GradientTransformation]:
    key = jax.random.PRNGKey(trainer_cfg.seed)
    params, model_state = init_model(
        model_cfg, key, num_frames=num_frames, image_shape=image_shape
    )
    optimizer = optax.adam(trainer_cfg.lr)
    opt_state = optimizer.init(params)
    return (
        TrainState(
            params=params,
            opt_state=opt_state,
            model_state=model_state,
            step=jnp.asarray(0, jnp.int32),
        ),
        optimizer,
    )


def make_train_step(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    optimizer: optax.GradientTransformation,
    base_key: jax.Array,
) -> Callable:
    """Build the single-step update: (state, batch, flows, tracks) -> state, metrics."""

    def train_step(
        state: TrainState,
        batch: Batch,
        flows: Flows,
        tracks: Optional[Sequence[Tracks]],
    ) -> tuple[TrainState, dict]:
        h, w = batch.videos.shape[-2:]
        key = jax.random.fold_in(base_key, state.step)

        # Stage-boundary focal handoff (pure param rewrite, usually identity).
        params = dict(state.params)
        params["intrinsics"] = maybe_handoff_focal(
            model_cfg.intrinsics,
            params["intrinsics"],
            state.model_state.intrinsics,
            state.step,
        )

        def loss_fn(p):
            output, new_model_state = forward(
                model_cfg,
                p,
                state.model_state,
                batch,
                flows,
                state.step,
                key,
                train=True,
            )
            total, individual = compute_losses(
                loss_cfgs, flows, tracks, output, state.step, (h, w)
            )
            return total, (individual, new_model_state, output)

        (total, (individual, new_model_state, output)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        metrics = {"loss/total": total, **{f"loss/{k}": v for k, v in individual.items()}}
        if batch.intrinsics is not None:
            metrics["intrinsics/fx_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 0, 0])
                - jnp.mean(output.intrinsics[..., 0, 0])
            )
            metrics["intrinsics/fy_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 1, 1])
                - jnp.mean(output.intrinsics[..., 1, 1])
            )

        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            model_state=new_model_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_train_chunk(train_step: Callable, chunk_size: int) -> Callable:
    """Scan `chunk_size` steps inside one compiled call."""

    def chunk(state, batch, flows, tracks):
        def body(carry, _):
            new_state, metrics = train_step(carry, batch, flows, tracks)
            return new_state, metrics

        return jax.lax.scan(body, state, None, length=chunk_size)

    # Donating the carried state lets XLA reuse its buffers across chunks.
    return jax.jit(chunk, donate_argnums=(0,))


def eval_forward(
    model_cfg: ModelCfg,
    state: TrainState,
    batch: Batch,
    flows: Flows,
    key: Optional[jax.Array] = None,
):
    """Model forward for validation/export at the current step.

    Applies the stage-boundary focal handoff first: when evaluating exactly at
    `regression.after_step` (before the training step that persists the
    handoff), the raw regressed focal is still its placeholder value.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    params = dict(state.params)
    params["intrinsics"] = maybe_handoff_focal(
        model_cfg.intrinsics,
        params["intrinsics"],
        state.model_state.intrinsics,
        state.step,
    )
    output, _ = forward(
        model_cfg, params, state.model_state, batch, flows, state.step, key,
        train=False,
    )
    return output


def _autosize_warp_radius(model_cfg: ModelCfg, flows: Flows, height: int) -> ModelCfg:
    import dataclasses

    import numpy as np

    backbone = model_cfg.backbone
    if getattr(backbone, "warp_impl", None) not in ("matmul", "pallas"):
        return model_cfg
    from ..ops.warp import radius_for_flows

    radius = radius_for_flows(np.asarray(flows.backward[..., 1]), height)
    return dataclasses.replace(
        model_cfg, backbone=dataclasses.replace(backbone, warp_radius=radius)
    )


def run_overfit(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    trainer_cfg: OverfitTrainerCfg,
    batch: Batch,
    flows: Flows,
    tracks: Optional[Sequence[Tracks]] = None,
    on_validation: Optional[Callable] = None,
    init_params: Optional[dict] = None,
) -> tuple[TrainState, dict]:
    """Run the full overfitting schedule; returns final state + timing info.

    `on_validation(state, step, metrics_history)` is called every
    `val_check_interval` steps (the reference's validation/visualization hook).
    """
    _, f, _, h, w = batch.videos.shape
    state, optimizer = init_train_state(model_cfg, trainer_cfg, f, (h, w))

    if init_params is not None:
        # Non-strict weights-only load (reference overfit.py:89-92): leaves
        # missing entries at their initialization; optimizer state restarts.
        def merge(target, loaded):
            if isinstance(target, dict):
                return {
                    k: merge(v, loaded[k]) if isinstance(loaded, dict) and k in loaded else v
                    for k, v in target.items()
                }
            if isinstance(target, list):
                if isinstance(loaded, list) and len(loaded) == len(target):
                    return [merge(t, l) for t, l in zip(target, loaded)]
                return target
            return loaded if loaded is not None else target

        state = state.replace(params=merge(state.params, init_params))

    # Pack ragged track segments into one uniform vmapped computation (much
    # smaller XLA graphs; numerically identical — see tracking.pack_tracks).
    if isinstance(tracks, (list, tuple)) and len(tracks) > 0:
        from ..tracking import pack_tracks

        tracks = pack_tracks(list(tracks), f)

    # Size the matmul-warp window from the actual flow field so the warp is
    # exact for this scene (ops/warp.py).
    model_cfg = _autosize_warp_radius(model_cfg, flows, h)
    key = jax.random.PRNGKey(trainer_cfg.seed + 1)
    train_step = make_train_step(model_cfg, loss_cfgs, optimizer, key)

    interval = min(trainer_cfg.val_check_interval, trainer_cfg.max_steps)
    chunk = make_train_chunk(train_step, interval)

    t_start = time.time()
    history: dict[str, list] = {}
    steps_done = 0
    while steps_done < trainer_cfg.max_steps:
        state, metrics = chunk(state, batch, flows, tracks)
        steps_done += interval
        # Fetch the last step's metrics (one host sync per interval).
        fetched = {k: float(v[-1]) for k, v in metrics.items()}
        for k, v in fetched.items():
            history.setdefault(k, []).append(v)
        if on_validation is not None:
            on_validation(state, steps_done, fetched)

    timing = {"optimization_runtime": time.time() - t_start}
    return state, {"history": history, **timing}
