from .intrinsics import (
    IntrinsicsCfg,
    IntrinsicsGroundTruthCfg,
    IntrinsicsRegressedCfg,
    IntrinsicsSoftminCfg,
    IntrinsicsState,
    RegressionCfg,
    apply_intrinsics,
    init_intrinsics,
    init_intrinsics_state,
)

__all__ = [
    "IntrinsicsCfg",
    "IntrinsicsGroundTruthCfg",
    "IntrinsicsRegressedCfg",
    "IntrinsicsSoftminCfg",
    "IntrinsicsState",
    "RegressionCfg",
    "apply_intrinsics",
    "init_intrinsics",
    "init_intrinsics_state",
]
