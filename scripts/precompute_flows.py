"""Precompute flow (and optionally flow-chained tracks) for a scene.

The reference's primary baseline configuration runs FlowMap on precomputed
GMFlow flow (BASELINE.md config #1). This script produces the `flows.npz`
(+ `tracks.npz`) consumed by `flow=precomputed` / `tracking=precomputed`:

    python scripts/precompute_flows.py --images /path/frames --out /path/out \
        [--predictor gmflow|raft] [--checkpoint ckpt.pth] [--tracks]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--predictor", default="gmflow", choices=["gmflow", "raft"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--tracks", action="store_true")
    parser.add_argument("--pixels", type=int, default=43200)
    parser.add_argument("--flow-multiplier", type=int, default=4)
    args = parser.parse_args()

    from flowmap_tpu.config.loader import compose_config  # noqa: F401 (env setup)
    from flowmap_tpu.datasets import (
        DatasetImagesCfg,
        FrameSamplerOverfitCfg,
        get_dataset,
    )
    from flowmap_tpu.datasets.dataset import example_to_batch
    from flowmap_tpu.flow import compute_flows
    from flowmap_tpu.flow.predictors import (
        FlowPredictorGMFlowCfg,
        FlowPredictorRaftCfg,
        save_flows,
    )
    from flowmap_tpu.utils.cropping import (
        CroppingCfg,
        crop_and_resize_batch_for_flow,
        crop_and_resize_batch_for_model,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    dataset = get_dataset(
        [DatasetImagesCfg(root=Path(args.images))],
        "train",
        FrameSamplerOverfitCfg(),
    )
    batch, _ = example_to_batch(dataset[0])
    cropping = CroppingCfg(
        image_shape=args.pixels, flow_scale_multiplier=args.flow_multiplier
    )
    batch_model, _ = crop_and_resize_batch_for_model(batch, cropping)
    batch_flow = crop_and_resize_batch_for_flow(batch, cropping)
    model_shape = tuple(batch_model.videos.shape[-2:])

    if args.predictor == "gmflow":
        cfg = FlowPredictorGMFlowCfg(checkpoint=args.checkpoint)
    else:
        cfg = FlowPredictorRaftCfg(checkpoint=args.checkpoint)

    print(f"Computing {args.predictor} flow for {batch.videos.shape[1]} frames...")
    flows = compute_flows(batch_flow, model_shape, cfg)
    save_flows(out / "flows.npz", flows)
    print(f"Wrote {out / 'flows.npz'}")

    if args.tracks:
        from flowmap_tpu.tracking import save_tracks
        from flowmap_tpu.tracking.tracker_flow_chain import (
            TrackPredictorFlowChainCfg,
            generate_video_tracks_flow_chain,
        )

        tracks = generate_video_tracks_flow_chain(
            batch_model, flows, TrackPredictorFlowChainCfg()
        )
        save_tracks(out / "tracks.npz", tracks)
        print(f"Wrote {out / 'tracks.npz'}")


if __name__ == "__main__":
    main()
