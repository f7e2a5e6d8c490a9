from .extrinsics import (
    ExtrinsicsCfg,
    ExtrinsicsProcrustesCfg,
    ExtrinsicsRegressedCfg,
    apply_extrinsics,
    init_extrinsics,
)

__all__ = [
    "ExtrinsicsCfg",
    "ExtrinsicsProcrustesCfg",
    "ExtrinsicsRegressedCfg",
    "apply_extrinsics",
    "init_extrinsics",
]
