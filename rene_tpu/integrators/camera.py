"""Perspective camera ray generation.

Port of PerspectiveCamera::get_ray (rene-shader/src/camera.rs:77-90): push the
jittered NDC point through the inverse projection (glam transform_point3a
semantics — no perspective divide) and the camera-to-world transform.
Pixel jitter follows the raygen shader: u=(x+xi)/(W-1), v=(y+xi)/(H-1)
(lib.rs:178-179); the film row flip happens at accumulation (film.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import math3d as m3
from ..ops import rng


def generate_rays(buffers, config, px, py, state):
    """px, py: (N,) int32 pixel coordinates. Returns (org, dir, state)."""
    w = config.film.xresolution
    h = config.film.yresolution
    ju, state = rng.next_f32(state)
    jv, state = rng.next_f32(state)
    u = (px.astype(jnp.float32) + ju) / jnp.float32(max(w - 1, 1))
    v = (py.astype(jnp.float32) + jv) / jnp.float32(max(h - 1, 1))

    ndc = jnp.stack([u * 2.0 - 1.0, v * 2.0 - 1.0, jnp.ones_like(u)], -1)
    target_cam = m3.mat4_point_no_divide(buffers["camera_proj_inv"], ndc)
    c2w = buffers["camera_to_world"]
    origin = m3.mat4_point_no_divide(
        c2w, jnp.zeros((1, 3), jnp.float32))[0]
    target = m3.mat4_point_no_divide(c2w, target_cam)
    direction = m3.normalize(target - origin[None, :])
    org = jnp.broadcast_to(origin, direction.shape)
    return org, direction, state
