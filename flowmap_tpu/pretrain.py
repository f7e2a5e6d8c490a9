"""Pretraining CLI: `python -m flowmap_tpu.pretrain [overrides...]`.

Parity: `flowmap/pretrain.py:28-75` — cross-scene training of the depth
backbone on CO3D/RE10k clips, flow computed on the fly by a frozen GMFlow,
flow loss only, checkpoints every `checkpoint.every_n_train_steps`.

Multi-chip: data parallelism over the mesh "data" axis. On a multi-host pod
slice run one process per host (`jax.distributed.initialize()` is called when
JAX reports multiple processes); each host feeds its local batch shard.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .utils.contracts import maybe_install_shape_contracts

maybe_install_shape_contracts()  # FLOWMAP_CHECK_SHAPES=1 (reference overfit.py:16-19)

from .config import PretrainCfg, compose_config
from .datasets import get_dataset
from .datasets.loader import PrefetchLoader
from .flow import compute_bidirectional_flow
from .training.pretrain import (
    PretrainTrainerCfg,
    init_pretrain_state,
    make_pretrain_step,
)
from .types import Batch
from .utils.cropping import (
    crop_and_resize_batch_for_flow,
    crop_and_resize_batch_for_model,
)
from .visualization import LocalLogger


def _dict_to_batch(example: dict) -> Batch:
    return Batch(
        videos=jnp.asarray(example["videos"], jnp.float32),
        indices=jnp.asarray(example["indices"]),
        extrinsics=(
            jnp.asarray(example["extrinsics"]) if "extrinsics" in example else None
        ),
        intrinsics=(
            jnp.asarray(example["intrinsics"]) if "intrinsics" in example else None
        ),
        scenes=tuple(example.get("scenes", ())),
        datasets=tuple(example.get("datasets", ())),
    )


def pretrain(cfg: PretrainCfg) -> None:
    start = time.time()
    logger = LocalLogger(Path(cfg.output_dir))

    # Force dataset-side image shape to the flow resolution (pretrain.py:33-36).
    dataset = get_dataset(
        cfg.dataset,
        "train",
        cfg.frame_sampler,
        seed=cfg.data_module.train.seed + jax.process_index(),
    )
    loader = PrefetchLoader(
        dataset,
        batch_size=cfg.data_module.train.batch_size,
        seed=cfg.data_module.train.seed,
        global_rank=jax.process_index(),
        num_threads=min(cfg.data_module.train.num_workers, 8),
    )

    trainer_cfg = PretrainTrainerCfg(
        lr=cfg.model_wrapper.lr,
        max_steps=cfg.trainer.max_steps,
        val_check_interval=cfg.trainer.val_check_interval,
        checkpoint_every=cfg.checkpoint.every_n_train_steps,
    )
    state, optimizer = init_pretrain_state(cfg.model, trainer_cfg)

    if cfg.checkpoint.load is not None:
        from .training.checkpoint import load_params

        state = state.replace(
            params=load_params(Path(cfg.checkpoint.load), state.params)
        )

    # On-the-fly frozen flow predictor (GMFlow or RAFT — the reference
    # supports both everywhere, flowmap/flow/__init__.py:9-14).
    from .flow.predictors import FlowPredictorGMFlowCfg, FlowPredictorRaftCfg

    if isinstance(cfg.flow, FlowPredictorGMFlowCfg):
        from .flow.gmflow import GMFlowPredictor

        predictor = GMFlowPredictor(cfg.flow)
    elif isinstance(cfg.flow, FlowPredictorRaftCfg):
        from .flow.raft import RaftPredictor

        predictor = RaftPredictor(cfg.flow)
    else:
        raise ValueError(f"pretrain flow predictor: {cfg.flow.name}")

    def flow_fn(batch_for_flow: Batch, model_shape):
        return compute_bidirectional_flow(
            predictor.__call__, batch_for_flow, model_shape
        )

    # Data parallelism: the global batch (local batch x process_count) is
    # sharded on the mesh "data" axis; parameter/state inputs stay replicated
    # and gradient all-reduce is implicit in the partitioner (the TPU-native
    # equivalent of the reference's DDP, `flowmap/pretrain.py:54-59`).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.distributed import make_data_mesh, make_global_batch

    mesh = make_data_mesh(cfg.data_module.train.batch_size)
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    rank_zero = jax.process_index() == 0

    step_fn = jax.jit(
        make_pretrain_step(
            cfg.model,
            cfg.loss,
            optimizer,
            flow_fn,
            jax.random.PRNGKey(trainer_cfg.seed + 1),
            cropping_cfg=cfg.cropping,
        ),
        donate_argnums=(0,),
        in_shardings=(replicated, data_sharded, data_sharded),
    )

    checkpoint_dir = Path(cfg.output_dir) / "checkpoints"
    for step_index, example in enumerate(iter(loader)):
        if step_index >= cfg.trainer.max_steps:
            break
        batch = make_global_batch(_dict_to_batch(example), mesh)
        state, metrics = step_fn(state, batch, batch)

        if (step_index + 1) % cfg.trainer.val_check_interval == 0:
            fetched = {
                k: float(np.asarray(v.addressable_data(0)))
                for k, v in metrics.items()
            }
            if rank_zero:
                logger.log_metrics(fetched, step_index + 1)
                pretty = " ".join(
                    f"{k}={v:.5f}" for k, v in sorted(fetched.items())
                )
                print(f"step {step_index + 1}: {pretty}")

            # Visualization step on the current batch (the reference's
            # ValidationWrapper yields one random example for the same
            # purpose, `dataset/validation_wrapper.py`). Runs eagerly on
            # addressable data, so single-process only.
            if cfg.visualizer and jax.process_count() == 1:
                from .model.model import forward as model_forward
                from .visualization import run_visualizers

                batch_model, _ = crop_and_resize_batch_for_model(
                    batch, cfg.cropping
                )
                batch_flow = crop_and_resize_batch_for_flow(batch, cfg.cropping)
                flows_vis = flow_fn(
                    batch_flow, tuple(batch_model.videos.shape[-2:])
                )
                output, _ = model_forward(
                    cfg.model,
                    state.params,
                    state.model_state,
                    batch_model,
                    flows_vis,
                    state.step,
                    jax.random.PRNGKey(0),
                    train=False,
                )
                visuals = run_visualizers(
                    cfg.visualizer,
                    batch_model,
                    flows_vis,
                    None,
                    output,
                    step_index + 1,
                )
                for key, value in visuals.items():
                    if value.ndim == 0:
                        logger.log_metrics({key: float(value)}, step_index + 1)
                    else:
                        logger.log_image(key, value, step_index + 1)

        if (step_index + 1) % cfg.checkpoint.every_n_train_steps == 0:
            from .training.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, state, step_index + 1)

    from .training.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # async saves must commit before we report done
    print(f"Pretraining done in {time.time() - start:.1f}s -> {cfg.output_dir}")


def _apply_platform_override() -> None:
    """Honor FLOWMAP_PLATFORM=cpu|tpu|axon.

    The image's sitecustomize imports jax at interpreter start with
    JAX_PLATFORMS already pinned, so the usual env var cannot redirect runs
    to CPU; this hook uses the config (effective until a backend
    initializes).
    """
    import os

    platform = os.environ.get("FLOWMAP_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main() -> None:
    _apply_platform_override()
    from .utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from .parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    cfg = compose_config("pretrain", PretrainCfg, sys.argv[1:])
    pretrain(cfg)


if __name__ == "__main__":
    main()
