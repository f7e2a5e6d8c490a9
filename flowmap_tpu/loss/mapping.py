"""Pointwise robust distance mappings (L1 / L2 / Huber).

Parity: `flowmap/loss/mapping/*.py` in the reference. A mapping takes two
(..., 2) coordinate arrays, corrects for aspect-ratio skew of normalized
coordinates, and returns a per-point scalar distance. Implemented as pure
functions dispatched on a tiny config dataclass (instead of nn.Module
subclasses) so the whole loss is one fused XLA computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import jax.numpy as jnp
from jaxtyping import Array, Float


@dataclass(frozen=True)
class MappingCfg:
    name: Literal["l1", "l2", "huber"] = "huber"
    delta: Optional[float] = 0.01  # only used by huber


def fix_aspect_ratio(
    points: Float[Array, "*b 2"],
    image_shape: tuple[int, int],
) -> Float[Array, "*b 2"]:
    """Scale normalized coordinates so distances are isotropic.

    Normalized [0,1]^2 coordinates skew distances by the aspect ratio; scaling
    by (w, h)/sqrt(h*w) corrects this (reference:
    `flowmap/loss/mapping/mapping.py:9-25`).
    """
    h, w = image_shape
    scale = (h * w) ** 0.5
    correction = jnp.asarray([w / scale, h / scale], dtype=points.dtype)
    return points * correction


def apply_mapping(
    cfg: MappingCfg,
    a: Float[Array, "*b 2"],
    b: Float[Array, "*b 2"],
    image_shape: tuple[int, int],
) -> Float[Array, "*b"]:
    """Aspect-corrected robust distance between coordinate arrays a and b."""
    delta = fix_aspect_ratio(a, image_shape) - fix_aspect_ratio(b, image_shape)
    return apply_mapping_components(cfg, delta[..., 0], delta[..., 1])


def apply_mapping_components(
    cfg: MappingCfg,
    du: Float[Array, "*b"],
    dv: Float[Array, "*b"],
) -> Float[Array, "*b"]:
    """Mapping on an already-aspect-corrected componentwise delta.

    Same math as `apply_mapping` without requiring the caller to materialize
    a stacked (..., 2) delta tensor — the hot losses keep u/v as separate
    planes so the whole mapping fuses into one elementwise XLA loop.
    """
    if cfg.name == "l2":
        # 0.5 factor matches torch huber_loss conventions (mapping_l2.py:18-24).
        return 0.5 * (du * du + dv * dv)
    norm = jnp.sqrt(du * du + dv * dv + 1e-24)
    if cfg.name == "l1":
        return norm
    if cfg.name == "huber":
        # torch huber: 0.5 x^2 if |x| < delta else delta*(|x| - 0.5*delta);
        # divided by delta so the linear-region slope matches L1
        # (mapping_huber.py:18-34).
        d = cfg.delta
        quadratic = 0.5 * norm * norm
        linear = d * (norm - 0.5 * d)
        return jnp.where(norm < d, quadratic, linear) / d
    raise ValueError(f"unknown mapping: {cfg.name}")
