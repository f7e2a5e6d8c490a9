from .colmap import export_to_colmap, read_colmap_model, write_colmap_model
from .colmap_io import Camera, Image, Point3D, read_model, write_model
from .ply import read_ply, write_ply

__all__ = [
    "Camera",
    "Image",
    "Point3D",
    "export_to_colmap",
    "read_colmap_model",
    "read_model",
    "read_ply",
    "write_colmap_model",
    "write_model",
    "write_ply",
]
