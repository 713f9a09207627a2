"""Vectorized 3D math: batched vec3 helpers, ONB, sampling, sphere UV.

Ports the reference's shader math utilities to lane-parallel jnp:
`coordinate_system`/ONB (reflection/onb.rs), `sphere_uv` and the random
direction samplers (math.rs). Rejection samplers are replaced with
closed-form equivalents (TPU lanes cannot loop independently):
`random_in_unit_disk` -> sqrt-radius polar sampling, `random_in_unit_sphere`
normalized -> uniform sphere direction. These produce the same
*distributions* the reference uses them for.

All functions broadcast over leading batch dims; vectors are trailing-dim-3.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import rng

PI = 3.14159265358979323846
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def length_squared(v):
    return dot(v, v)


def normalize(v, eps=1e-20):
    return v / jnp.maximum(length(v), eps)[..., None]


def face_forward(v, ref):
    """Flip v to lie in the hemisphere of ref (bxdf.rs:348-354)."""
    return jnp.where(dot(v, ref)[..., None] < 0.0, -v, v)


def reflect(wo, n):
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def coordinate_system(v1):
    """Branch-free port of math.rs:89-97; returns (v2, v3)."""
    x_major = jnp.abs(v1[..., 0]) > jnp.abs(v1[..., 1])
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(
        jnp.where(x_major,
                  v1[..., 0] ** 2 + v1[..., 2] ** 2,
                  v1[..., 1] ** 2 + v1[..., 2] ** 2), 1e-20))
    v2 = jnp.where(
        x_major[..., None],
        jnp.stack([-v1[..., 2], jnp.zeros_like(inv_a), v1[..., 0]], -1),
        jnp.stack([jnp.zeros_like(inv_a), v1[..., 2], -v1[..., 1]], -1),
    ) * inv_a[..., None]
    return v2, cross(v1, v2)


def onb_from_w(w):
    """Orthonormal basis (u, v, w) from normal w (onb.rs:13-18)."""
    u, v = coordinate_system(w)
    return u, v, w


def to_local(u, v, w, vec):
    return jnp.stack([dot(vec, u), dot(vec, v), dot(vec, w)], axis=-1)


def to_world(u, v, w, vec):
    return (vec[..., 0:1] * u + vec[..., 1:2] * v + vec[..., 2:3] * w)


# local-frame trig (onb.rs:28-86)
def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] ** 2


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(1.0 - cos2_theta(w), 0.0)


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return sin_theta(w) / cos_theta(w)


def tan2_theta(w):
    return sin2_theta(w) / cos2_theta(w)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(s, 1e-20),
                                             -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.maximum(s, 1e-20),
                                             -1.0, 1.0))


def cos2_phi(w):
    return cos_phi(w) ** 2


def sin2_phi(w):
    return sin_phi(w) ** 2


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


def sphere_uv(p):
    """Unit-direction -> (u,v) (math.rs:70-76)."""
    theta = jnp.arccos(jnp.clip(p[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(p[..., 1], p[..., 0])
    phi = jnp.where(phi < 0.0, phi + TWO_PI, phi)
    return jnp.stack([phi * 0.5 * INV_PI, (theta - PI) * -INV_PI], axis=-1)


# -- sampling (closed-form; distribution-equivalent to math.rs samplers) ----

def random_cosine_direction(state):
    """Cosine-weighted hemisphere (+z) direction (math.rs:45-56)."""
    r1, state = rng.next_f32(state)
    r2, state = rng.next_f32(state)
    z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    phi = TWO_PI * r1
    r2s = jnp.sqrt(r2)
    d = jnp.stack([jnp.cos(phi) * r2s, jnp.sin(phi) * r2s, z], axis=-1)
    return d, state


def random_unit_vector(state):
    """Uniform direction on the sphere (replaces rejection sampling)."""
    u1, state = rng.next_f32(state)
    u2, state = rng.next_f32(state)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1), state


def affine_point(m, p):
    """Apply (...,3,4) affine to (...,3) points."""
    return jnp.einsum("...ij,...j->...i", m[..., :3], p) + m[..., 3]


def affine_vector(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3], v)


def mat4_point_no_divide(m, p):
    """glam transform_point3a: xyz of M@(p,1), w ignored."""
    q = jnp.einsum("ij,...j->...i",
                   m, jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1))
    return q[..., :3]


def mat4_vector(m, v):
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)
