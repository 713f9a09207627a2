"""Fresnel terms: dielectric, conductor, no-op — component-SoA.

Port of rene-shader/src/reflection/fresnel.rs and the `fr_dielectric`
helper (reflection/bxdf.rs:138-165); per-channel math on (N,) arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene import types as T
from .vec3 import V3


def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel; handles ray-side swap and TIR."""
    c = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = c > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    c = jnp.abs(c)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    sin_t = ei / et * sin_i
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    r_parl = ((et * c) - (ei * cos_t)) / jnp.maximum((et * c) + (ei * cos_t),
                                                     1e-20)
    r_perp = ((ei * c) - (et * cos_t)) / jnp.maximum((ei * c) + (et * cos_t),
                                                     1e-20)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(sin_t >= 1.0, 1.0, f)


def _fr_conductor_channel(c2, s2, eta, eta_k, c):
    eta2 = eta * eta
    eta_k2 = eta_k * eta_k
    t0 = eta2 - eta_k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * eta_k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * c * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def fr_conductor(cos_theta_i, eta_i: V3, eta_t: V3, k: V3) -> V3:
    """Conductor Fresnel, per-channel (fresnel.rs:78-102)."""
    c = jnp.clip(cos_theta_i, -1.0, 1.0)
    c2 = c * c
    s2 = 1.0 - c2
    eta = eta_t / eta_i.map(lambda v: jnp.maximum(v, 1e-20))
    eta_k = k / eta_i.map(lambda v: jnp.maximum(v, 1e-20))
    return V3(_fr_conductor_channel(c2, s2, eta.x, eta_k.x, c),
              _fr_conductor_channel(c2, s2, eta.y, eta_k.y, c),
              _fr_conductor_channel(c2, s2, eta.z, eta_k.z, c))


def evaluate(fr_type, eta_i: V3, eta_t: V3, k: V3, cos_i,
             types_present=(T.FRESNEL_CONDUCTOR, T.FRESNEL_NOOP,
                            T.FRESNEL_DIELECTRIC)) -> V3:
    """EnumFresnel::evaluate (fresnel.rs:161-171), variant-pruned."""
    from . import vec3 as v3
    out = V3.ones(cos_i.shape)
    if T.FRESNEL_CONDUCTOR in types_present:
        cond = fr_conductor(jnp.abs(cos_i), eta_i, eta_t, k)
        out = v3.where(fr_type == T.FRESNEL_CONDUCTOR, cond, out)
    if T.FRESNEL_DIELECTRIC in types_present:
        diel = fr_dielectric(cos_i, eta_i.x, eta_t.x)
        out = v3.where(fr_type == T.FRESNEL_DIELECTRIC,
                       V3(diel, diel, diel), out)
    return out
