"""Film: accumulation layout, tone encoding, PNG/AOV output.

Matches the reference's film pipeline (rene/src/main.rs:1404-1810): a 3-layer
float32 accumulation (color / normal AOV / albedo AOV), averaged by the
sample count, color gamma-encoded with pbrt's 2.2 curve, AOVs encoded as
`256*clamp(v, 0, .999)` (normals remapped by 0.5x+0.5). The raygen writes to
row `H-1-y` (lib.rs:166); here that is a single flip at layout time.
"""
from __future__ import annotations

import numpy as np

from ..scene.assets.images import gamma_correct


def rays_to_image(per_ray: np.ndarray, width: int, height: int) -> np.ndarray:
    """(H*W, C) ray-order buffer -> (H, W, C) image with the reference's
    vertical flip (add_image writes at launch_size.y - 1 - y)."""
    img = np.asarray(per_ray).reshape(height, width, -1)
    return img[::-1]


def to_rgb8(linear: np.ndarray) -> np.ndarray:
    v = gamma_correct(np.asarray(linear, np.float32))
    return np.clip(np.round(255.0 * v), 0.0, 255.0).astype(np.uint8)


def to_aov8(linear: np.ndarray) -> np.ndarray:
    return (256.0 * np.clip(linear, 0.0, 0.999)).astype(np.uint8)


def to_aov_normal8(linear: np.ndarray) -> np.ndarray:
    return (256.0 * np.clip(linear * 0.5 + 0.5, 0.0, 0.999)).astype(np.uint8)


def save_png(path: str, rgb8: np.ndarray) -> str:
    """Save an (H, W, 3) uint8 image; `.exr` filenames fall back to `.png`
    like the reference (main.rs:1651-1656)."""
    from PIL import Image as PILImage
    path = str(path)
    if path.endswith(".exr"):
        path = path + ".png"
    PILImage.fromarray(rgb8, mode="RGB").save(path)
    return path
