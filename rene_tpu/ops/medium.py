"""Participating media: homogeneous medium + vacuum, component-SoA.

Port of rene-shader/src/medium.rs: Beer–Lambert transmittance, per-channel
distance sampling with the spectral MIS pdf, and the Henyey–Greenstein phase
function and its sampler. The vacuum/homogeneous `match` becomes masked
selects over the medium-index array.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..scene import types as T
from . import rng
from . import vec3 as v3
from .vec3 import V3


def _gather3(table, idx) -> V3:
    return V3(table[idx, 0], table[idx, 1], table[idx, 2])


def _sigma_t(buffers, med_idx):
    return (_gather3(buffers["med_sigma_a"], med_idx)
            + _gather3(buffers["med_sigma_s"], med_idx))


def med_is_vacuum(buffers, med_idx):
    return buffers["med_type"][med_idx] == T.MEDIUM_VACUUM


def med_tr(buffers, med_idx, direction: V3, t) -> V3:
    """Transmittance along `t` (medium.rs:106-108); vacuum -> 1."""
    sigma_t = _sigma_t(buffers, med_idx)
    tr = (-sigma_t * (direction.length() * t)).exp()
    return v3.where(med_is_vacuum(buffers, med_idx), 1.0, tr)


def med_sample(buffers, med_idx, org: V3, direction: V3, t_max, state):
    """Distance sampling (medium.rs:110-133).

    Returns (sampled, position V3, tr_weight V3, state); vacuum lanes return
    sampled=False, tr=1.
    """
    sigma_t = _sigma_t(buffers, med_idx)
    ch_u, state = rng.next_u32(state)
    channel = (ch_u % jnp.uint32(3)).astype(jnp.int32)
    u, state = rng.next_f32(state)
    sig_ch = jnp.where(channel == 0, sigma_t.x,
                       jnp.where(channel == 1, sigma_t.y, sigma_t.z))
    dist = -jnp.log(jnp.maximum(1.0 - u, 1e-10)) / jnp.maximum(sig_ch, 1e-20)
    dlen = direction.length()
    t = dist / jnp.maximum(dlen, 1e-20)
    sampled = t < t_max
    t = jnp.minimum(t, t_max)
    tr = (-sigma_t * (t * dlen)).exp()
    density = v3.where(sampled, sigma_t * tr, tr)
    pdf = density.sum() / 3.0
    pdf = jnp.where(pdf == 0.0, 1.0, pdf)
    sigma_s = _gather3(buffers["med_sigma_s"], med_idx)
    weight = v3.where(sampled, tr * sigma_s, tr) * (1.0 / pdf)
    position = org + direction * t

    vac = med_is_vacuum(buffers, med_idx)
    return (jnp.where(vac, False, sampled),
            v3.where(vac, org, position),
            v3.where(vac, 1.0, weight),
            state)


def med_phase(buffers, med_idx, wo: V3, wi: V3):
    """Henyey–Greenstein phase function (medium.rs:135-140); vacuum -> 0."""
    g = buffers["med_g"][med_idx]
    cos_theta = wo.dot(wi)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    hg = (1.0 / (4.0 * math.pi)) * (1.0 - g * g) \
        / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-20)), 1e-20)
    return jnp.where(med_is_vacuum(buffers, med_idx), 0.0, hg)


def med_sample_p(buffers, med_idx, wo: V3, state):
    """Sample a scattered direction from HG (medium.rs:142-157)."""
    g = buffers["med_g"][med_idx]
    u0, state = rng.next_f32(state)
    u1, state = rng.next_f32(state)
    iso = 1.0 - 2.0 * u0
    sqr = (1.0 - g * g) / jnp.maximum(1.0 + g - 2.0 * g * u0, 1e-9)
    aniso = -(1.0 + g * g - sqr * sqr) / jnp.where(
        jnp.abs(g) < 1e-9, 1e-9, 2.0 * g)
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, iso, aniso)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * math.pi * u1
    w1, w2 = v3.coordinate_system(wo)
    d = (w1 * (sin_theta * jnp.cos(phi)) + w2 * (sin_theta * jnp.sin(phi))
         + wo * cos_theta)
    return d, state
