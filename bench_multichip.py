#!/usr/bin/env python
"""Multi-chip scaling benchmark: frames/s of the frame-sharded overfit step.

BASELINE.md north-star row 3: "150-frame T&T scenes across >= 2 hosts,
frames/s throughput at 1 chip / 1 host / N hosts". This script is that
measurement as one command. On a real pod slice it reports true scaling; in
this single-chip/zero-egress environment it runs the identical GSPMD program
on a virtual CPU mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count),
which validates the machinery and the scaling *shape* (the partitioned HLO is
what a pod would run), not absolute speed — the JSON labels which one it was.

Usage:
    python bench_multichip.py [--devices 1 2 4 8] [--frames 64] [--steps 5]

Prints ONE JSON line:
    {"metric": "multichip_frames_per_sec", "value": {...per mesh size...},
     "unit": "frames/s", "platform": "cpu|tpu", "virtual_mesh": true|false}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--height", type=int, default=160)
    parser.add_argument("--width", type=int, default=224)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--collectives", default="gspmd",
                        choices=["gspmd", "explicit"])
    args = parser.parse_args()

    max_dev = max(args.devices)

    # Fall back to a virtual CPU mesh when the runtime exposes fewer devices
    # than requested (must happen before the backend initializes).
    import jax

    virtual = False
    if max_dev > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max_dev}"
            ).strip()
        try:
            jax.config.update("jax_platforms", "cpu")
            virtual = True
        except Exception:
            pass

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    n_avail = len(jax.devices())
    sizes = [n for n in args.devices if n <= n_avail]
    platform = jax.devices()[0].platform

    from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
    from flowmap_tpu.model import (
        BackboneMidasCfg,
        ExtrinsicsProcrustesCfg,
        IntrinsicsSoftminCfg,
        ModelCfg,
        RegressionCfg,
    )
    from flowmap_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_batch,
        shard_flows,
    )
    from flowmap_tpu.tracking import pack_tracks
    from flowmap_tpu.training.overfit import (
        OverfitTrainerCfg,
        _autosize_warp_radius,
        init_train_state,
        make_train_step,
    )
    from flowmap_tpu.utils.synthetic import (
        SyntheticSceneCfg,
        make_scene,
        make_track_segments,
    )

    f, (h, w) = args.frames, (args.height, args.width)
    batch, flows, gt_depths = make_scene(
        SyntheticSceneCfg(num_frames=f, image_shape=(h, w))
    )
    tracks = pack_tracks(
        make_track_segments(batch, gt_depths, interval=5, radius=10, grid_size=16),
        f,
    )
    model_cfg = ModelCfg(
        backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
        intrinsics=IntrinsicsSoftminCfg(
            regression=RegressionCfg(after_step=1000, window=100)
        ),
        extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
    )
    model_cfg = _autosize_warp_radius(model_cfg, flows, h)
    loss_cfgs = [LossFlowCfg(), LossTrackingCfg(enable_after=0)]
    trainer_cfg = OverfitTrainerCfg(lr=3e-5, max_steps=args.steps)

    results = {}
    for n in sizes:
        state, optimizer = init_train_state(model_cfg, trainer_cfg, f, (h, w))
        step = make_train_step(
            model_cfg, loss_cfgs, optimizer, jax.random.PRNGKey(0),
            staged_vjp=trainer_cfg.staged_vjp,
        )
        mesh = make_mesh(n_data=1, n_frame=n)
        sharded = make_sharded_train_step(
            step, mesh, state, batch, collectives=args.collectives
        )
        b_s, f_s = shard_batch(batch, mesh), shard_flows(flows, mesh)
        for _ in range(args.warmup):
            state, metrics = sharded(state, b_s, f_s, tracks)
        float(metrics["loss/total"])
        t0 = time.time()
        for _ in range(args.steps):
            state, metrics = sharded(state, b_s, f_s, tracks)
        float(metrics["loss/total"])
        dt = (time.time() - t0) / args.steps
        results[str(n)] = round(f / dt, 3)
        print(f"# mesh={n}: {dt * 1000:.1f} ms/step = {f / dt:.1f} frames/s",
              file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "multichip_frames_per_sec",
                "collectives": args.collectives,
                "value": results,
                "unit": "frames/s",
                "platform": platform,
                "virtual_mesh": virtual,
                "frames": f,
                "image_shape": [h, w],
            }
        )
    )


if __name__ == "__main__":
    main()
