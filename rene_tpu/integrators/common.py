"""Shared integrator pieces: background lookup, emitter surface sampling."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import rng
from ..ops import vec3 as v3
from ..ops.texture import tex_color
from ..ops.vec3 import V3
from ..scene import types as T


def background_radiance(buffers, direction: V3, config=None) -> V3:
    """Infinite-light radiance for escaped rays (main_miss, lib.rs:120-139).
    """
    n = direction.x.shape[0]
    m = buffers["background_matrix"]
    d = V3(m[0, 0] * direction.x + m[0, 1] * direction.y
           + m[0, 2] * direction.z,
           m[1, 0] * direction.x + m[1, 1] * direction.y
           + m[1, 2] * direction.z,
           m[2, 0] * direction.x + m[2, 1] * direction.y
           + m[2, 2] * direction.z).normalized()
    u, v = v3.sphere_uv(d)
    tex_idx = jnp.broadcast_to(buffers["background_texture"], (n,))
    tex = tex_color(buffers, tex_idx, (u, v), config)
    bg = buffers["background_color"]
    return tex * V3(bg[0], bg[1], bg[2])


def sample_background(buffers, state):
    """Importance-sample the imagemap infinite light (env_nee).

    Draws a coarse (ENV_GH, ENV_GW) texel from the luminance*sin(theta)
    distribution (marginal row CDF, then the row's conditional CDF),
    a uniform point inside it, and returns the WORLD direction plus the
    solid-angle pdf (= env_pdf[r, c] exactly — see device.py). Beyond
    the reference: rene only picks the env up through the miss shader
    (lib.rs:120-139), which fireflies on HDR window texels."""
    import math

    mcdf = buffers["env_mcdf"]          # (GH,)
    ccdf = buffers["env_ccdf"]          # (GH, GW)
    gh, gw = ccdf.shape
    x1, state = rng.next_f32(state)
    x2, state = rng.next_f32(state)
    x3, state = rng.next_f32(state)
    x4, state = rng.next_f32(state)
    r = jnp.sum(mcdf[None, :] < x1[:, None], axis=1).astype(jnp.int32)
    r = jnp.clip(r, 0, gh - 1)
    rows = jnp.take(ccdf, r, axis=0)    # (N, GW)
    c = jnp.sum(rows < x2[:, None], axis=1).astype(jnp.int32)
    c = jnp.clip(c, 0, gw - 1)
    theta = (r.astype(jnp.float32) + x3) * (math.pi / gh)
    phi = (c.astype(jnp.float32) + x4) * (2.0 * math.pi / gw)
    st = jnp.sin(theta)
    d_l = V3(st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))
    m = buffers["background_matrix_inv"]
    wi = V3(m[0, 0] * d_l.x + m[0, 1] * d_l.y + m[0, 2] * d_l.z,
            m[1, 0] * d_l.x + m[1, 1] * d_l.y + m[1, 2] * d_l.z,
            m[2, 0] * d_l.x + m[2, 1] * d_l.y + m[2, 2] * d_l.z)
    pdf = buffers["env_pdf"][r, c]
    return wi.normalized(), pdf, state


def background_pdf(buffers, direction: V3):
    """Solid-angle pdf sample_background would have for `direction`."""
    import math

    m = buffers["background_matrix"]
    d = V3(m[0, 0] * direction.x + m[0, 1] * direction.y
           + m[0, 2] * direction.z,
           m[1, 0] * direction.x + m[1, 1] * direction.y
           + m[1, 2] * direction.z,
           m[2, 0] * direction.x + m[2, 1] * direction.y
           + m[2, 2] * direction.z).normalized()
    gh, gw = buffers["env_ccdf"].shape
    theta = jnp.arccos(jnp.clip(d.z, -1.0, 1.0))
    phi = jnp.arctan2(d.y, d.x)
    phi = jnp.where(phi < 0.0, phi + 2.0 * math.pi, phi)
    r = jnp.clip((theta * (gh / math.pi)).astype(jnp.int32), 0, gh - 1)
    c = jnp.clip((phi * (gw / (2.0 * math.pi))).astype(jnp.int32),
                 0, gw - 1)
    return buffers["env_pdf"][r, c]


def sample_emit_object(buffers, config, position: V3, state):
    """Uniformly pick an emissive object and sample a direction to it.

    Triangles: uniform barycentric point (EnumSurfaceSample::sample,
    surface_sample.rs:74-105). Spheres: uniform direction in the visible
    cone (pbrt-style), matching the cone pdf `trace_emissive_pdf` reports.
    The reference samples a uniform point on the WHOLE sphere
    (surface_sample.rs:107-117) while weighting with the cone pdf
    (area_light.rs) — an inconsistent density that measurably brightens
    glossy surfaces under large close sphere lights (veach-mis plates
    read ~40% over the Tungsten golden); we use the consistent estimator.
    """
    e = config.num_emit_objects
    u_obj, state = rng.next_u32(state)
    eo = (u_obj % jnp.uint32(max(e, 1))).astype(jnp.int32)
    kind = buffers["eo_kind"][eo]
    tri_start = buffers["eo_tri_start"][eo]
    prim_count = buffers["eo_prim_count"][eo]

    # triangle: uniform primitive, uniform barycentric point
    u_prim, state = rng.next_u32(state)
    prim = (u_prim % prim_count.astype(jnp.uint32)).astype(jnp.int32)
    tri_id = jnp.clip(tri_start + prim, 0, max(config.num_triangles - 1, 0))
    g = jnp.take(buffers["tri_pT"], tri_id, axis=1)  # (9, N)
    r, state = rng.next_f32(state)
    s, state = rng.next_f32(state)
    flip = (r + s) > 1.0
    r = jnp.where(flip, 1.0 - r, r)
    s = jnp.where(flip, 1.0 - s, s)
    w0 = 1.0 - r - s
    tri_pt = V3(g[0] * w0 + g[3] * r + g[6] * s,
                g[1] * w0 + g[4] * r + g[7] * s,
                g[2] * w0 + g[5] * r + g[8] * s)

    tri_dir = (tri_pt - position).normalized()
    if config.num_emit_spheres > 0:
        # sphere: uniform direction within the visible cone; radius from
        # the o2w column norms (rotation-safe), and a uniform-sphere
        # fallback when the shading point is inside the emitter (where
        # cos_max clamps to 0 and the cone density would be wrong)
        import math
        m = jnp.take(buffers["eo_matrixT"], eo, axis=1)
        center = V3(m[3], m[7], m[11])
        radius = (jnp.sqrt(m[0] ** 2 + m[4] ** 2 + m[8] ** 2)
                  + jnp.sqrt(m[1] ** 2 + m[5] ** 2 + m[9] ** 2)
                  + jnp.sqrt(m[2] ** 2 + m[6] ** 2 + m[10] ** 2)) / 3.0
        to_c = center - position
        d2 = jnp.maximum(to_c.dot(to_c), 1e-12)
        cos_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / d2, 0.0))
        inside = d2 <= radius * radius
        u1, state = rng.next_f32(state)
        u2, state = rng.next_f32(state)
        cos_t = jnp.where(inside, 1.0 - 2.0 * u1,
                          1.0 - u1 * (1.0 - cos_max))
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = 2.0 * math.pi * u2
        onb = v3.Onb.from_w(to_c.normalized())
        sph_dir = (onb.u * (jnp.cos(phi) * sin_t)
                   + onb.v * (jnp.sin(phi) * sin_t)
                   + onb.w * cos_t)
        return v3.where(kind == T.KIND_SPHERE, sph_dir, tri_dir), state
    return tri_dir, state


def random_unit_vector(state):
    """Uniform direction on the sphere (replaces the reference's rejection
    sampling with a closed form, math.rs:8-20)."""
    import math
    u1, state = rng.next_f32(state)
    u2, state = rng.next_f32(state)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * math.pi * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z), state
