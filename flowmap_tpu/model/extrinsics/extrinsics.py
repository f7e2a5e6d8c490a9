"""Extrinsics estimation: Procrustes alignment (default) or regressed poses.

Parity: `flowmap/model/extrinsics/extrinsics_procrustes.py:22-59` and
`extrinsics_regressed.py:17-83`. The Procrustes point subset is static for
`randomize_points=False` (linspace indices baked into the compiled graph);
randomized subsets draw from the per-step PRNG key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float

from ...ops.geometry import get_extrinsics
from ...ops.procrustes import quaternion_to_matrix
from ...ops.surface import align_surfaces
from ...types import Batch, BackboneOutput, Flows


@dataclass(frozen=True)
class ExtrinsicsProcrustesCfg:
    name: Literal["procrustes"] = "procrustes"
    num_points: Optional[int] = 1000
    randomize_points: bool = False


@dataclass(frozen=True)
class ExtrinsicsRegressedCfg:
    name: Literal["regressed"] = "regressed"


ExtrinsicsCfg = ExtrinsicsProcrustesCfg | ExtrinsicsRegressedCfg


def init_extrinsics(cfg: ExtrinsicsCfg, num_frames: Optional[int]) -> dict:
    if isinstance(cfg, ExtrinsicsRegressedCfg):
        assert num_frames is not None and num_frames >= 2
        rotations = jnp.zeros((num_frames - 1, 4), jnp.float32)
        # Identity quaternions in scipy (x, y, z, w) order
        # (extrinsics_regressed.py:62-64).
        rotations = rotations.at[:, -1].set(1.0)
        return {
            "translations": jnp.zeros((num_frames - 1, 3), jnp.float32),
            "rotations": rotations,
        }
    return {}


def _scipy_quaternion_to_matrix(q: Float[Array, "*b 4"]) -> Float[Array, "*b 3 3"]:
    """Quaternion in scipy (x, y, z, w) order -> rotation matrix, with the
    reference's soft normalization (extrinsics_regressed.py:17-39)."""
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q / jnp.sqrt(norm_sq + 1e-8)
    wxyz = jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)
    return quaternion_to_matrix(wxyz)


def apply_extrinsics(
    cfg: ExtrinsicsCfg,
    params: dict,
    batch: Batch,
    flows: Flows,
    backbone_output: BackboneOutput,
    surfaces: Float[Array, "b f h w 3"],
    key: jax.Array,
) -> Float[Array, "b f 4 4"]:
    b, f, h, w, _ = surfaces.shape

    if isinstance(cfg, ExtrinsicsRegressedCfg):
        assert b == 1, "regressed extrinsics only make sense during overfitting"
        rotation = _scipy_quaternion_to_matrix(params["rotations"])
        top = jnp.concatenate(
            [rotation, params["translations"][..., None]], axis=-1
        )
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], surfaces.dtype), (f - 1, 1, 4)
        )
        tf = jnp.concatenate([top, bottom], axis=-2)
        return get_extrinsics(tf)[None]

    assert isinstance(cfg, ExtrinsicsProcrustesCfg)
    if cfg.num_points is None:
        indices = jnp.arange(h * w)
    elif cfg.randomize_points:
        indices = jax.random.randint(key, (cfg.num_points,), 0, h * w)
    else:
        # Static linspace subset — constant-folded into the compiled graph.
        indices = jnp.asarray(
            np.linspace(0, h * w - 1, cfg.num_points).astype(np.int32)
        )

    return align_surfaces(surfaces, flows.backward, backbone_output.weights, indices)
