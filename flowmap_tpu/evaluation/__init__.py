from .evaluate import evaluate_against_colmap, evaluate_scene_dir, scene_table

__all__ = ["evaluate_against_colmap", "evaluate_scene_dir", "scene_table"]
