"""Fresnel terms: dielectric, conductor, no-op — vectorized.

Port of rene-shader/src/reflection/fresnel.rs and the `fr_dielectric`
helper (reflection/bxdf.rs:138-165).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene import types as T


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


def fr_conductor(cos_theta_i, eta_i, eta_t, k):
    """Conductor Fresnel, per-channel (fresnel.rs:78-102). Inputs:
    cos (N,), eta_i/eta_t/k (N,3). Returns (N,3)."""
    c = jnp.clip(cos_theta_i, -1.0, 1.0)[..., None]
    eta = eta_t / jnp.maximum(eta_i, 1e-20)
    eta_k = k / jnp.maximum(eta_i, 1e-20)
    c2 = c * c
    s2 = 1.0 - c2
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


def evaluate(fr_type, eta_i, eta_t, k, cos_i):
    """EnumFresnel::evaluate (fresnel.rs:161-171). Shapes: fr_type (N,),
    eta_i/eta_t/k (N,3), cos_i (N,). Returns (N,3)."""
    cond = fr_conductor(jnp.abs(cos_i), eta_i, eta_t, k)
    diel = fr_dielectric(cos_i, eta_i[..., 0], eta_t[..., 0])[..., None]
    out = jnp.where((fr_type == T.FRESNEL_CONDUCTOR)[..., None], cond,
                    jnp.ones_like(cond))
    out = jnp.where((fr_type == T.FRESNEL_DIELECTRIC)[..., None],
                    jnp.broadcast_to(diel, cond.shape), out)
    return out
