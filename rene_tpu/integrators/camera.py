"""Perspective camera ray generation (component-SoA).

Port of PerspectiveCamera::get_ray (rene-shader/src/camera.rs:77-90): push
the jittered NDC point through the inverse projection (glam
transform_point3a semantics — no perspective divide) and the camera-to-world
transform. Pixel jitter follows the raygen shader: u=(x+xi)/(W-1),
v=(y+xi)/(H-1) (lib.rs:178-179); the film row flip happens at accumulation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import rng
from ..ops.vec3 import V3


def filter_jitter(u, radius):
    """Map a uniform [0,1) jitter to the pixel-filter sample offset.

    radius == 0: box (the raw jitter, mean 0.5). radius > 0: tent
    (triangle) filter of that radius via filter importance sampling —
    offset = 0.5 + r*(sqrt(2u)-1) for u<1/2, mirrored above (weight 1;
    the shipped goldens use PixelFilter "triangle" 1.0)."""
    if not radius:
        return u
    half = jnp.minimum(u, 1.0 - u)
    mag = 1.0 - jnp.sqrt(jnp.maximum(2.0 * half, 0.0))
    return 0.5 + radius * jnp.where(u < 0.5, -mag, mag)


def generate_rays(buffers, config, px, py, state):
    """px, py: (N,) int32 pixel coordinates. Returns (org V3, dir V3, state).
    """
    w = config.film.xresolution
    h = config.film.yresolution
    ju, state = rng.next_f32(state)
    jv, state = rng.next_f32(state)
    r = getattr(config, "filter_radius", 0.0)
    ju = filter_jitter(ju, r)
    jv = filter_jitter(jv, r)
    u = (px.astype(jnp.float32) + ju) / jnp.float32(max(w - 1, 1))
    v = (py.astype(jnp.float32) + jv) / jnp.float32(max(h - 1, 1))

    proj = buffers["camera_proj_inv"]
    c2w = buffers["camera_to_world"]
    ndc = V3(u * 2.0 - 1.0, v * 2.0 - 1.0, jnp.ones_like(u))
    # glam transform_point3a: xyz of M @ (p, 1), no perspective divide
    tc = V3(proj[0, 0] * ndc.x + proj[0, 1] * ndc.y + proj[0, 2] * ndc.z
            + proj[0, 3],
            proj[1, 0] * ndc.x + proj[1, 1] * ndc.y + proj[1, 2] * ndc.z
            + proj[1, 3],
            proj[2, 0] * ndc.x + proj[2, 1] * ndc.y + proj[2, 2] * ndc.z
            + proj[2, 3])
    target = V3(c2w[0, 0] * tc.x + c2w[0, 1] * tc.y + c2w[0, 2] * tc.z
                + c2w[0, 3],
                c2w[1, 0] * tc.x + c2w[1, 1] * tc.y + c2w[1, 2] * tc.z
                + c2w[1, 3],
                c2w[2, 0] * tc.x + c2w[2, 1] * tc.y + c2w[2, 2] * tc.z
                + c2w[2, 3])
    origin = V3(jnp.broadcast_to(c2w[0, 3], u.shape),
                jnp.broadcast_to(c2w[1, 3], u.shape),
                jnp.broadcast_to(c2w[2, 3], u.shape))
    direction = (target - origin).normalized()
    return origin, direction, state
