from .device import RenderConfig, build_device_scene, to_jax
from .flatten import FlatScene, TlasInstance, WorldState, create_scene, load_scene
from .intermediate import Film, SceneError

__all__ = [
    "RenderConfig", "build_device_scene", "to_jax", "FlatScene",
    "TlasInstance", "WorldState", "create_scene", "load_scene", "Film",
    "SceneError",
]
