from .evaluate import (
    EVAL_SCENES,
    check_model,
    evaluate_against_colmap,
    evaluate_scene_dir,
    scene_table,
)

__all__ = [
    "EVAL_SCENES",
    "check_model",
    "evaluate_against_colmap",
    "evaluate_scene_dir",
    "scene_table",
]
