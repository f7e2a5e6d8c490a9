from .backbone import BackboneCfg, BackboneExplicitDepthCfg, BackboneMidasCfg
from .extrinsics import ExtrinsicsCfg, ExtrinsicsProcrustesCfg, ExtrinsicsRegressedCfg
from .intrinsics import (
    IntrinsicsCfg,
    IntrinsicsGroundTruthCfg,
    IntrinsicsRegressedCfg,
    IntrinsicsSoftminCfg,
    RegressionCfg,
)
from .model import ModelCfg, ModelState, export, forward, init_model

__all__ = [
    "BackboneCfg",
    "BackboneExplicitDepthCfg",
    "BackboneMidasCfg",
    "ExtrinsicsCfg",
    "ExtrinsicsProcrustesCfg",
    "ExtrinsicsRegressedCfg",
    "IntrinsicsCfg",
    "IntrinsicsGroundTruthCfg",
    "IntrinsicsRegressedCfg",
    "IntrinsicsSoftminCfg",
    "ModelCfg",
    "ModelState",
    "RegressionCfg",
    "export",
    "forward",
    "init_model",
]
