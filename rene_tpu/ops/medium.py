"""Participating media: homogeneous medium + vacuum, vectorized.

Port of rene-shader/src/medium.rs: Beer–Lambert transmittance, per-channel
distance sampling with the spectral MIS pdf, and the Henyey–Greenstein phase
function and its sampler. The vacuum/homogeneous `match` becomes masked
selects over the medium-index array.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene import types as T
from . import math3d as m3
from . import rng


def _sigma_t(buffers, med_idx):
    return (buffers["med_sigma_a"][med_idx]
            + buffers["med_sigma_s"][med_idx])


def med_is_vacuum(buffers, med_idx):
    return buffers["med_type"][med_idx] == T.MEDIUM_VACUUM


def med_tr(buffers, med_idx, direction, t):
    """Transmittance along `t` (medium.rs:106-108); vacuum -> 1."""
    sigma_t = _sigma_t(buffers, med_idx)
    tr = jnp.exp(-sigma_t * (m3.length(direction) * t)[..., None])
    return jnp.where(med_is_vacuum(buffers, med_idx)[..., None], 1.0, tr)


def med_sample(buffers, med_idx, org, direction, t_max, state):
    """Distance sampling (medium.rs:110-133).

    Returns (sampled, position, tr_weight, state); vacuum lanes return
    sampled=False, tr=1.
    """
    sigma_t = _sigma_t(buffers, med_idx)
    ch_u, state = rng.next_u32(state)
    channel = (ch_u % jnp.uint32(3)).astype(jnp.int32)
    u, state = rng.next_f32(state)
    sig_ch = jnp.take_along_axis(sigma_t, channel[..., None], axis=-1)[..., 0]
    dist = -jnp.log(jnp.maximum(1.0 - u, 1e-10)) / jnp.maximum(sig_ch, 1e-20)
    dlen = m3.length(direction)
    t = dist / jnp.maximum(dlen, 1e-20)
    sampled = t < t_max
    t = jnp.minimum(t, t_max)
    tr = jnp.exp(-sigma_t * (t * dlen)[..., None])
    density = jnp.where(sampled[..., None], sigma_t * tr, tr)
    pdf = jnp.mean(density, axis=-1)
    pdf = jnp.where(pdf == 0.0, 1.0, pdf)
    sigma_s = buffers["med_sigma_s"][med_idx]
    weight = jnp.where(sampled[..., None], tr * sigma_s, tr) \
        / pdf[..., None]
    position = org + t[..., None] * direction

    vac = med_is_vacuum(buffers, med_idx)
    return (jnp.where(vac, False, sampled),
            jnp.where(vac[..., None], org, position),
            jnp.where(vac[..., None], 1.0, weight),
            state)


def med_phase(buffers, med_idx, wo, wi):
    """Henyey–Greenstein phase function (medium.rs:135-140); vacuum -> 0."""
    g = buffers["med_g"][med_idx]
    cos_theta = m3.dot(wo, wi)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    hg = (1.0 / (4.0 * m3.PI)) * (1.0 - g * g) \
        / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-20)), 1e-20)
    return jnp.where(med_is_vacuum(buffers, med_idx), 0.0, hg)


def med_sample_p(buffers, med_idx, wo, state):
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
    phi = m3.TWO_PI * u1
    v1, v2 = m3.coordinate_system(wo)
    d = (sin_theta * jnp.cos(phi))[..., None] * v1 \
        + (sin_theta * jnp.sin(phi))[..., None] * v2 \
        + cos_theta[..., None] * wo
    return d, state
