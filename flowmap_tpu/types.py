"""Core pytree data types.

Mirrors the reference's tensor-bundle dataclasses (`flowmap/dataset/types.py:9-19`,
`flowmap/flow/flow_predictor.py:16-22`, `flowmap/tracking/track_predictor.py:13-20`,
`flowmap/model/model.py:24-38` in dcharatan/flowmap) but as registered JAX pytrees:
`jax.tree_util` replaces the reference's hand-rolled `Manipulable` mixin
(`flowmap/misc/manipulable.py`) — device movement, slicing, and concatenation all
come for free from tree mapping.

Conventions (identical to the reference):
- videos:      (batch, frame, 3, height, width), float32 in [0, 1]
- depths:      (batch, frame, height, width)
- flows:       (batch, frame-1, height, width, 2), normalized [0,1] coords delta
- intrinsics:  (..., 3, 3), normalized (focal/principal divided by image size)
- extrinsics:  (..., 4, 4), camera-to-world (OpenCV convention: +x right,
               +y down, +z forward)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jaxtyping import Array, Bool, Float, Int


@struct.dataclass
class Batch:
    """One video clip (or a batch of clips) plus optional ground truth."""

    videos: Float[Array, "b f 3 h w"]
    indices: Int[Array, "b f"]
    # Ground truth (used only for evaluation / ablations).
    extrinsics: Optional[Float[Array, "b f 4 4"]] = None
    intrinsics: Optional[Float[Array, "b f 3 3"]] = None
    # Non-pytree metadata.
    scenes: tuple[str, ...] = struct.field(pytree_node=False, default=())
    datasets: tuple[str, ...] = struct.field(pytree_node=False, default=())


@struct.dataclass
class Flows:
    """Precomputed bidirectional optical flow, in normalized [0,1] coordinates.

    forward[b, i] maps frame i -> i+1; backward[b, i] maps frame i+1 -> i.
    Masks are soft validity weights from photometric consistency.
    """

    forward: Float[Array, "b p h w 2"]
    backward: Float[Array, "b p h w 2"]
    forward_mask: Float[Array, "b p h w"]
    backward_mask: Float[Array, "b p h w"]


@struct.dataclass
class Tracks:
    """Point tracks for one temporal segment (reference: every `interval`
    frames a (grid, ±radius)-window CoTracker segment)."""

    xy: Float[Array, "b f p 2"]  # normalized [0,1] coordinates
    visibility: Bool[Array, "b f p"]
    start_frame: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class TracksPacked:
    """All track segments stacked with a uniform window length.

    Segments in the reference have ragged frame windows (boundary windows are
    shorter, `flowmap/tracking/__init__.py:49-58`), which would unroll into
    one XLA subgraph per segment. Packing pads every segment to a common
    window length (padding frames carry visibility=False, so losses are
    unchanged) and records each segment's start frame, turning the tracking
    loss into a single vmapped computation — far smaller graphs and better
    TPU utilization.
    """

    xy: Float[Array, "b s l p 2"]
    visibility: Bool[Array, "b s l p"]
    starts: Int[Array, " s"]  # clamped so starts[i] + l <= num_frames


@struct.dataclass
class BackboneOutput:
    depths: Float[Array, "b f h w"]
    weights: Float[Array, "b p h w"]  # backward correspondence weights, p = f-1


@struct.dataclass
class ModelOutput:
    depths: Float[Array, "b f h w"]
    surfaces: Float[Array, "b f h w 3"]  # camera-space point clouds
    intrinsics: Float[Array, "b f 3 3"]
    extrinsics: Float[Array, "b f 4 4"]
    backward_correspondence_weights: Float[Array, "b p h w"]


@struct.dataclass
class ModelExports:
    extrinsics: Float[Array, "b f 4 4"]
    intrinsics: Float[Array, "b f 3 3"]
    colors: Float[Array, "b f 3 h w"]
    depths: Float[Array, "b f h w"]


def tree_slice_frames(tree, start: int, stop: int):
    """Slice every frame-indexed leaf `[:, start:stop]` (axis 1)."""
    return jax.tree_util.tree_map(lambda x: x[:, start:stop], tree)


def tree_to_device(tree, device):
    return jax.device_put(tree, device)


def tree_astype(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
