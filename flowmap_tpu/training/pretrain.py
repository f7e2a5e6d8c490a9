"""Cross-scene pretraining of the depth backbone.

Parity: `flowmap/model/model_wrapper_pretrain.py` + `flowmap/pretrain.py` —
clips of `num_frames=8`, flow computed ON THE FLY per batch by a frozen
predictor, flow loss only, Adam. TPU redesign:

- The train step (flow precompute -> model -> loss -> grads -> Adam) is one
  jitted function with static clip shapes (fixed `cropping.image_shape`), so
  there is no per-batch retracing.
- Data parallelism shards the batch axis over the mesh "data" axis; gradient
  all-reduce is implicit in the partitioner (the reference needs Lightning
  DDP + NCCL for the same).
- Host-side data loading is a background-thread prefetcher (torch-free).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..loss.loss import LossCfg, compute_losses
from ..model.model import ModelCfg, ModelState, forward, init_model
from ..types import Batch, Flows


@dataclass(frozen=True)
class PretrainTrainerCfg:
    lr: float = 5e-5
    max_steps: int = 50_000
    val_check_interval: int = 250
    checkpoint_every: int = 50_000
    seed: int = 0


@struct.dataclass
class PretrainState:
    params: dict
    opt_state: optax.OptState
    model_state: ModelState
    step: jax.Array


FlowFn = Callable[[Batch, tuple[int, int]], Flows]


def init_pretrain_state(
    model_cfg: ModelCfg,
    trainer_cfg: PretrainTrainerCfg,
) -> tuple[PretrainState, optax.GradientTransformation]:
    key = jax.random.PRNGKey(trainer_cfg.seed)
    # num_frames/image_shape stay None: pretraining must not instantiate
    # per-frame explicit parameters (reference pretrain.py:39).
    params, model_state = init_model(model_cfg, key)
    optimizer = optax.adam(trainer_cfg.lr)
    return (
        PretrainState(
            params=params,
            opt_state=optimizer.init(params),
            model_state=model_state,
            step=jnp.asarray(0, jnp.int32),
        ),
        optimizer,
    )


def make_pretrain_step(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    optimizer: optax.GradientTransformation,
    flow_fn: FlowFn,
    base_key: jax.Array,
    cropping_cfg=None,
) -> Callable:
    """Build the jitted pretrain update; flow is computed inside the step
    (frozen predictor — wrapped in stop_gradient). With `cropping_cfg`, the
    model/flow crops also happen inside the compiled step (the reference's
    `preprocess_batch`, `model_wrapper_pretrain.py:46-58`) so the host ships
    one raw batch per step."""

    def pretrain_step(state: PretrainState, batch: Batch, batch_for_flow: Batch):
        if cropping_cfg is not None:
            from ..utils.cropping import (
                crop_and_resize_batch_for_flow,
                crop_and_resize_batch_for_model,
            )

            batch_for_flow = crop_and_resize_batch_for_flow(batch, cropping_cfg)
            batch, _ = crop_and_resize_batch_for_model(batch, cropping_cfg)
        h, w = batch.videos.shape[-2:]
        key = jax.random.fold_in(base_key, state.step)

        flows = jax.tree_util.tree_map(
            jax.lax.stop_gradient, flow_fn(batch_for_flow, (h, w))
        )

        def loss_fn(params):
            output, new_model_state = forward(
                model_cfg,
                params,
                state.model_state,
                batch,
                flows,
                state.step,
                key,
                train=True,
            )
            total, individual = compute_losses(
                loss_cfgs, flows, None, output, state.step, (h, w)
            )
            return total, (individual, new_model_state, output)

        (total, (individual, new_model_state, output)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss/total": total,
            **{f"loss/{k}": v for k, v in individual.items()},
        }
        if batch.intrinsics is not None:
            metrics["intrinsics/fx_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 0, 0])
                - jnp.mean(output.intrinsics[..., 0, 0])
            )

        return (
            PretrainState(
                params=new_params,
                opt_state=new_opt_state,
                model_state=new_model_state,
                step=state.step + 1,
            ),
            metrics,
        )

    return pretrain_step


def run_pretrain(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    trainer_cfg: PretrainTrainerCfg,
    batches: Iterator[tuple[Batch, Batch]],  # (model batch, flow batch)
    flow_fn: FlowFn,
    on_validation: Optional[Callable] = None,
    checkpoint_dir=None,
) -> tuple[PretrainState, dict]:
    """Drive pretraining over a host-side batch iterator."""
    state, optimizer = init_pretrain_state(model_cfg, trainer_cfg)
    step_fn = jax.jit(
        make_pretrain_step(
            model_cfg,
            loss_cfgs,
            optimizer,
            flow_fn,
            jax.random.PRNGKey(trainer_cfg.seed + 1),
        ),
        donate_argnums=(0,),
    )

    history: dict[str, list] = {}
    t_start = time.time()
    for step_index in range(trainer_cfg.max_steps):
        batch, batch_for_flow = next(batches)
        state, metrics = step_fn(state, batch, batch_for_flow)
        if (step_index + 1) % trainer_cfg.val_check_interval == 0:
            fetched = {k: float(v) for k, v in metrics.items()}
            for k, v in fetched.items():
                history.setdefault(k, []).append(v)
            if on_validation is not None:
                on_validation(state, step_index + 1, fetched)
        if checkpoint_dir is not None and (
            (step_index + 1) % trainer_cfg.checkpoint_every == 0
        ):
            from .checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, state, step_index + 1)

    if checkpoint_dir is not None:
        # Async writes (training/checkpoint.py) must commit before the run
        # is reported complete.
        from .checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
    return state, {"history": history, "runtime": time.time() - t_start}
