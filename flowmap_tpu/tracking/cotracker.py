"""CoTracker track predictor (staged port).

The reference tracks query grids with CoTracker w8 via torch.hub
(`flowmap/tracking/track_predictor_cotracker.py:20-56`). A faithful JAX port
of the CoTracker transformer (factorized time/track attention over sampled
correlation features) is staged work; until it lands, use either:

- `tracking=flow_chain` — the TPU-native flow-chaining tracker
  (`tracker_flow_chain.py`), which needs no pretrained weights and produces
  the same (xy, visibility) segment supervision from the precomputed flow; or
- `tracking=precomputed` with tracks exported from the reference pipeline
  (`flowmap_tpu.tracking.save_tracks` format).
"""

from __future__ import annotations

from ..types import Batch, Tracks


def generate_video_tracks(batch: Batch, cfg, pre_cfg) -> list[Tracks]:
    raise NotImplementedError(
        "The CoTracker network port is staged; use `tracking=flow_chain` "
        "(weight-free flow-chaining tracker) or `tracking=precomputed` "
        "(tracks exported from the reference pipeline) in the meantime."
    )
