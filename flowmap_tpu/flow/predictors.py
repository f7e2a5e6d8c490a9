"""Flow predictor registry and dispatch.

Parity: `flowmap/flow/__init__.py:9-33` + the raft/gmflow predictor configs.
Predictors are frozen (no gradients); `compute_flows` is the precompute entry
point called once per scene before optimization.

The GMFlow port (JAX) lives in `gmflow.py`; its checkpoint converter accepts
the public gmflow_sintel checkpoint. `FlowPredictorPrecomputedCfg` loads flow
fields computed offline (e.g. by the reference pipeline) for exact
apples-to-apples comparisons.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..types import Batch, Flows
from .common import compute_bidirectional_flow, rescale_flow, rescale_mask


@dataclass(frozen=True)
class FlowPredictorRaftCfg:
    name: Literal["raft"] = "raft"
    num_flow_updates: int = 32
    max_batch_size: int = 8
    show_progress_bar: bool = True
    checkpoint: Optional[Path] = None  # converted torchvision raft_large weights


@dataclass(frozen=True)
class FlowPredictorGMFlowCfg:
    name: Literal["gmflow"] = "gmflow"
    cache_path: Path = Path(".cache/gmflow_checkpoints")
    checkpoint: Optional[Path] = None  # converted gmflow_sintel weights
    max_batch_size: int = 8
    # bfloat16 runs the frozen net MXU-native (activations rounded; matmul
    # accumulation stays f32; flow output is f32 either way). The shipped
    # pretrain config enables it (configs/pretrain.yaml); float32 remains
    # the default for oracle-exact parity.
    compute_dtype: Literal["float32", "bfloat16"] = "float32"


@dataclass(frozen=True)
class FlowPredictorPrecomputedCfg:
    """Load flows precomputed offline (npz with forward/backward/masks)."""

    name: Literal["precomputed"] = "precomputed"
    path: Path = Path("flows.npz")


FlowPredictorCfg = Union[
    FlowPredictorRaftCfg, FlowPredictorGMFlowCfg, FlowPredictorPrecomputedCfg
]


def load_precomputed_flows(
    path: Path,
    flow_shape: tuple[int, int],
) -> Flows:
    """Read an .npz of {forward, backward, forward_mask, backward_mask} in the
    reference's normalized-coordinate convention and rescale to model res."""
    data = np.load(path)
    flows = Flows(
        forward=jnp.asarray(data["forward"]),
        backward=jnp.asarray(data["backward"]),
        forward_mask=jnp.asarray(data["forward_mask"]),
        backward_mask=jnp.asarray(data["backward_mask"]),
    )
    if flows.forward.shape[2:4] != tuple(flow_shape):
        flows = Flows(
            forward=rescale_flow(flows.forward, flow_shape),
            backward=rescale_flow(flows.backward, flow_shape),
            forward_mask=rescale_mask(flows.forward_mask, flow_shape),
            backward_mask=rescale_mask(flows.backward_mask, flow_shape),
        )
    return flows


def save_flows(path: Path, flows: Flows) -> None:
    np.savez_compressed(
        path,
        forward=np.asarray(flows.forward),
        backward=np.asarray(flows.backward),
        forward_mask=np.asarray(flows.forward_mask),
        backward_mask=np.asarray(flows.backward_mask),
    )


def compute_flows(
    batch: Batch,
    flow_shape: tuple[int, int],
    cfg: FlowPredictorCfg,
) -> Flows:
    """Precompute bidirectional flow for a scene (reference:
    `flow/__init__.py:23-33`)."""
    if isinstance(cfg, FlowPredictorPrecomputedCfg):
        return load_precomputed_flows(cfg.path, flow_shape)

    if isinstance(cfg, FlowPredictorGMFlowCfg):
        from .gmflow import GMFlowPredictor

        predictor = GMFlowPredictor(cfg)
        return compute_bidirectional_flow(predictor, batch, flow_shape)

    if isinstance(cfg, FlowPredictorRaftCfg):
        from .raft import RaftPredictor

        predictor = RaftPredictor(cfg)
        return compute_bidirectional_flow(predictor, batch, flow_shape)

    raise ValueError(f"unknown flow predictor: {cfg}")
