from .scene import Scene, Geometry, derive_geometry, build_scene
from .loader import parse_scene_file, parse_scene_dict
