from .loader import compose_config, parse_overrides
from .tools import from_dict
from .types import CommonCfg, OverfitCfg, PretrainCfg

__all__ = [
    "CommonCfg",
    "OverfitCfg",
    "PretrainCfg",
    "compose_config",
    "from_dict",
    "parse_overrides",
]
