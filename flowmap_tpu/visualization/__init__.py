from .color import apply_color_map_to_depth, flow_to_color
from .local_logger import LocalLogger
from .visualizers import (
    VisualizerCfg,
    VisualizerSummaryCfg,
    VisualizerTrajectoryCfg,
    run_visualizers,
)

__all__ = [
    "LocalLogger",
    "VisualizerCfg",
    "VisualizerSummaryCfg",
    "VisualizerTrajectoryCfg",
    "apply_color_map_to_depth",
    "flow_to_color",
    "run_visualizers",
]
