"""Per-scene optimization CLI: `python -m flowmap_tpu.overfit [overrides...]`.

Parity: `flowmap/overfit.py:44-153` — load one scene as one batch, precompute
flow (and tracks when the tracking loss is enabled), optimize for
`trainer.max_steps`, visualize every `trainer.val_check_interval`, export a
COLMAP model (+ dense .ply) and `runtime.json`.

Overrides use dotted `key=value` syntax plus stackable `+experiment=name`
packages (configs/experiment/*.yaml), mirroring the reference's Hydra CLI.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

# Before the package imports below: with FLOWMAP_CHECK_SHAPES=1 every
# annotated function in subsequently-imported flowmap_tpu modules is
# shape-checked per call (reference `flowmap/overfit.py:16-19`).
from .utils.contracts import maybe_install_shape_contracts

maybe_install_shape_contracts()

from .config import OverfitCfg, compose_config
from .datasets import example_to_batch, get_dataset
from .export import export_to_colmap
from .flow import compute_flows
from .loss import LossTrackingCfg
from .tracking import compute_tracks
from .training.overfit import (
    OverfitTrainerCfg,
    eval_forward,
    run_overfit,
)
from .types import ModelExports
from .utils.cropping import (
    crop_and_resize_batch_for_flow,
    crop_and_resize_batch_for_model,
)
from .visualization import LocalLogger, run_visualizers


def overfit(cfg: OverfitCfg) -> dict:
    start_time = time.time()
    logger = LocalLogger(Path(cfg.output_dir))

    # Optional wandb mirror of the LocalLogger (reference
    # `misc/common_training_setup.py:33-55`): scalars/images, source upload.
    # A no-op facade when mode="disabled" or wandb is unavailable.
    from .utils.wandb_tools import WandbLogger

    wandb_logger = WandbLogger(cfg.wandb, Path(cfg.output_dir))
    wandb_logger.log_code(Path(__file__).parent)

    # Load one scene as one batch (reference: overfit.py:53-58).
    dataset = get_dataset(cfg.dataset, "train", cfg.frame_sampler)
    example = dataset[0]
    batch_full, frame_paths = example_to_batch(example)
    print(f"Loaded scene {batch_full.scenes[0]}: {batch_full.videos.shape}")

    # Resize/crop for the model and (at higher resolution) for flow.
    batch, pre_crop_shape = crop_and_resize_batch_for_model(batch_full, cfg.cropping)
    batch_for_flow = crop_and_resize_batch_for_flow(batch_full, cfg.cropping)
    _, f, _, h, w = batch.videos.shape

    # Precompute supervision.
    print("Precomputing optical flow.")
    flows = compute_flows(batch_for_flow, (h, w), cfg.flow)

    tracks = None
    if cfg.tracking is not None and any(
        isinstance(l, LossTrackingCfg) for l in cfg.loss
    ):
        print("Precomputing tracks.")
        tracks = compute_tracks(
            batch_for_flow, cfg.tracking, cfg.track_precomputation, flows=flows
        )

    # Resolve the initialization checkpoint (weights only; the optimizer
    # restarts, matching reference overfit.py:89-92).
    init_params = None
    if cfg.checkpoint.load is not None:
        from .utils.wandb_tools import resolve_checkpoint

        ckpt_path = resolve_checkpoint(cfg.checkpoint.load)
        if str(ckpt_path).endswith((".ckpt", ".pt", ".pth")):
            from .utils.torch_convert import load_reference_checkpoint

            init_params = load_reference_checkpoint(ckpt_path)
        else:
            from .training.checkpoint import load_params

            init_params = load_params(ckpt_path)
        print(f"Loaded initialization from {ckpt_path}.")

    # Optimize.
    trainer_cfg = OverfitTrainerCfg(
        lr=cfg.model_wrapper.lr,
        max_steps=cfg.trainer.max_steps,
        val_check_interval=cfg.trainer.val_check_interval,
        sharding=cfg.trainer.sharding,
        collectives=cfg.trainer.collectives,
    )
    optimization_start = time.time()

    # Shape-bucketed padding: one compiled step per bucket across a scene
    # sweep (exact — utils/buckets.py). The real-frame views keep feeding
    # visualization/export.
    batch_real, flows_real = batch, flows
    f_real = f
    if cfg.trainer.frame_bucket and cfg.trainer.frame_bucket > 1:
        if getattr(cfg.model.backbone, "bn", None) == "batch":
            # Batch-statistics BN averages over the frame axis — padded
            # duplicate frames would shift every layer's statistics, so the
            # padding is NOT exact for this one configuration. Refusing is
            # better than a silent trajectory change.
            print(
                "Frame bucket DISABLED: model.backbone.bn=batch folds the "
                "padded frames into the BatchNorm statistics (padding is "
                "only exact for folded-BN / BN-free backbones)."
            )
        else:
            from .utils.buckets import pad_scene_to_bucket

            batch, flows, f_real = pad_scene_to_bucket(
                batch, flows, cfg.trainer.frame_bucket
            )
            if batch.videos.shape[1] != f_real:
                print(
                    f"Frame bucket: padded {f_real} -> "
                    f"{batch.videos.shape[1]} frames (multiple of "
                    f"{cfg.trainer.frame_bucket})."
                )

    def _slice_output(output):
        if batch.videos.shape[1] == f_real:
            return output
        import jax.tree_util

        f_padded = batch.videos.shape[1]

        def cut(x):
            # Frame-indexed leaves slice to f_real; pair-indexed (f-1)
            # leaves (correspondence weights) to f_real - 1.
            if x.ndim >= 2 and x.shape[1] == f_padded:
                return x[:, :f_real]
            if x.ndim >= 2 and x.shape[1] == f_padded - 1:
                return x[:, : f_real - 1]
            return x

        return jax.tree_util.tree_map(cut, output)

    def on_validation(state, step, metrics):
        output = _slice_output(eval_forward(cfg.model, state, batch, flows))
        visuals = run_visualizers(
            cfg.visualizer, batch_real, flows_real, tracks, output, step
        )
        scalars = dict(metrics)
        for key, value in visuals.items():
            if value.ndim == 0:
                scalars[key] = value
            else:
                logger.log_image(key, value, step)
                wandb_logger.log_image(key, value, step)
        logger.log_metrics(scalars, step)
        wandb_logger.log_metrics(scalars, step)
        pretty = " ".join(f"{k}={float(v):.5f}" for k, v in sorted(scalars.items()))
        print(f"step {step}: {pretty}")

    state, info = run_overfit(
        cfg.model,
        cfg.loss,
        trainer_cfg,
        batch,
        flows,
        tracks,
        on_validation=on_validation,
        init_params=init_params,
    )
    optimization_runtime = time.time() - optimization_start

    # Export (reference: overfit.py:117-147).
    output = _slice_output(eval_forward(cfg.model, state, batch, flows))
    exports = ModelExports(
        extrinsics=output.extrinsics,
        intrinsics=output.intrinsics,
        colors=batch_real.videos,
        depths=output.depths,
    )
    colmap_dir = Path(cfg.output_dir) / "colmap"
    export_to_colmap(
        exports,
        frame_paths or None,
        pre_crop_shape,
        tuple(batch_full.videos.shape[-2:]),
        colmap_dir,
    )

    # Full artifact set (reference overfit.py:119-147): colmap.zip, raw
    # exports, final weights.
    import shutil

    shutil.make_archive(str(Path(cfg.output_dir) / "colmap"), "zip", colmap_dir)
    np.savez_compressed(
        Path(cfg.output_dir) / "exports.npz",
        extrinsics=np.asarray(exports.extrinsics),
        intrinsics=np.asarray(exports.intrinsics),
        depths=np.asarray(exports.depths),
    )
    from .training.checkpoint import save_params

    save_params(Path(cfg.output_dir) / "final_params", state.params)

    if cfg.local_save_root is not None:
        dest = Path(cfg.local_save_root) / batch_full.scenes[0]
        dest.mkdir(parents=True, exist_ok=True)
        shutil.copy(Path(cfg.output_dir) / "colmap.zip", dest / "colmap.zip")

    runtime = {
        "runtime": time.time() - start_time,
        "optimization_runtime": optimization_runtime,
    }
    with open(Path(cfg.output_dir) / "runtime.json", "w") as fp:
        json.dump(runtime, fp)

    # Upload the final run outputs as a wandb artifact (reference
    # `overfit.py:149-153` uploads colmap.zip as artifact `colmap_<run_id>`
    # of type "colmap"); the final weights ride along, standing in for
    # Lightning's `log_model="all"` checkpoint upload.
    wandb_logger.log_artifact(
        "colmap_{run_id}",
        "colmap",
        {
            "colmap.zip": Path(cfg.output_dir) / "colmap.zip",
            "final_params": Path(cfg.output_dir) / "final_params",
        },
    )
    wandb_logger.finish()
    print(f"Done. runtime={runtime['runtime']:.1f}s -> {cfg.output_dir}")
    return {"state": state, "info": info, "runtime": runtime}


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
    cfg = compose_config("overfit", OverfitCfg, sys.argv[1:])
    overfit(cfg)


if __name__ == "__main__":
    main()
