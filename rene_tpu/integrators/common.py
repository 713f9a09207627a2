"""Shared integrator pieces: background lookup, emitter surface sampling."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import math3d as m3
from ..ops import rng
from ..ops.texture import tex_color
from ..scene import types as T


def background_radiance(buffers, direction, config=None):
    """Infinite-light radiance for escaped rays (main_miss, lib.rs:120-139)."""
    n = direction.shape[0]
    d = m3.normalize(m3.mat4_vector(buffers["background_matrix"], direction))
    uv = m3.sphere_uv(d)
    tex_idx = jnp.broadcast_to(buffers["background_texture"], (n,))
    tex = tex_color(buffers, tex_idx, uv, config)
    return buffers["background_color"][None, :] * tex


def sample_emit_object(buffers, config, position, state):
    """Uniformly pick an emissive object and a point on it; return the
    direction from `position` (EnumSurfaceSample::sample,
    surface_sample.rs:74-117 — triangles already world-space here).
    """
    e = config.num_emit_objects
    u_obj, state = rng.next_u32(state)
    eo = (u_obj % jnp.uint32(max(e, 1))).astype(jnp.int32)
    kind = buffers["eo_kind"][eo]
    tri_start = buffers["eo_tri_start"][eo]
    prim_count = buffers["eo_prim_count"][eo]
    matrix = buffers["eo_matrix"][eo]

    # triangle: uniform primitive, uniform barycentric point
    u_prim, state = rng.next_u32(state)
    prim = (u_prim % prim_count.astype(jnp.uint32)).astype(jnp.int32)
    tri_id = jnp.clip(tri_start + prim, 0,
                      max(config.num_triangles - 1, 0))
    p = buffers["tri_p"][tri_id]
    r, state = rng.next_f32(state)
    s, state = rng.next_f32(state)
    flip = (r + s) > 1.0
    r = jnp.where(flip, 1.0 - r, r)
    s = jnp.where(flip, 1.0 - s, s)
    tri_pt = (p[:, 0] * (1.0 - r - s)[:, None] + p[:, 1] * r[:, None]
              + p[:, 2] * s[:, None])

    # sphere: random unit vector through the instance matrix
    v, state = m3.random_unit_vector(state)
    sph_pt = m3.affine_point(matrix, v)

    point = jnp.where((kind == T.KIND_SPHERE)[:, None], sph_pt, tri_pt)
    return m3.normalize(point - position), state
