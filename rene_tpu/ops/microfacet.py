"""Trowbridge–Reitz (GGX) microfacet distribution, vectorized.

Port of rene-shader/src/reflection/microfacet.rs (itself pbrt-v3) to
branch-free jnp over lobe arrays: `d`, Smith `lambda`/`g`/`g1`,
visible-normal sampling `sample_wh`, `pdf`, and `roughness_to_alpha`.

Deviation (documented): the reference's `trowbridge_reitz_sample11`
mis-parenthesizes the G1 term (`2/(2+1/|a|)` instead of pbrt's
`2/(1+sqrt(1+1/a^2))`, microfacet.rs:91), biasing its visible-normal
sampling; we use the correct pbrt formula.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math3d as m3


def roughness_to_alpha(roughness):
    """pbrt roughness remap (microfacet.rs:65-74)."""
    r = jnp.maximum(roughness, 1e-3)
    x = jnp.log(r)
    return (1.62142 + 0.819955 * x + 0.1734 * x * x + 0.0171201 * x ** 3
            + 0.000640711 * x ** 4)


def tr_d(alpha, wh):
    """GGX normal distribution (microfacet.rs:141-155)."""
    ax = alpha[..., 0]
    ay = alpha[..., 1]
    tan2 = m3.tan2_theta(wh)
    cos4 = m3.cos2_theta(wh) ** 2
    e = (m3.cos2_phi(wh) / jnp.maximum(ax * ax, 1e-20)
         + m3.sin2_phi(wh) / jnp.maximum(ay * ay, 1e-20)) * tan2
    d = 1.0 / (m3.PI * ax * ay * cos4 * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(tan2) & jnp.isfinite(d), d, 0.0)


def tr_lambda(alpha, w):
    """Smith lambda (microfacet.rs:157-174)."""
    abs_tan = jnp.abs(m3.tan_theta(w))
    alpha2 = jnp.sqrt(m3.cos2_phi(w) * alpha[..., 0] ** 2
                      + m3.sin2_phi(w) * alpha[..., 1] ** 2)
    a = 1.0 / jnp.maximum(alpha2 * abs_tan, 1e-20)
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    lam = jnp.where((a >= 1.6) | ~jnp.isfinite(abs_tan), 0.0, lam)
    return lam


def tr_g(alpha, wo, wi):
    return 1.0 / (1.0 + tr_lambda(alpha, wo) + tr_lambda(alpha, wi))


def tr_g1(alpha, w):
    return 1.0 / (1.0 + tr_lambda(alpha, w))


def _sample11(cos_theta, u1, u2):
    """Visible-normal slope sampling (pbrt TrowbridgeReitzSample11)."""
    # normal-incidence special case
    r_s = jnp.sqrt(u1 / jnp.maximum(1.0 - u1, 1e-9))
    phi_s = m3.TWO_PI * u2
    special = (r_s * jnp.cos(phi_s), r_s * jnp.sin(phi_s))

    c = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    tan_theta = sin_theta / jnp.maximum(c, 1e-9)
    a0 = 1.0 / jnp.maximum(tan_theta, 1e-9)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a0 * a0)))

    a = 2.0 * u1 / jnp.maximum(g1, 1e-9) - 1.0
    tmp = jnp.minimum(1.0 / jnp.where(jnp.abs(a * a - 1.0) > 1e-12,
                                      a * a - 1.0, 1e-12), 1e10)
    b = tan_theta
    d = jnp.sqrt(jnp.maximum(b * b * tmp * tmp - (a * a - b * b) * tmp, 0.0))
    slope_x_1 = b * tmp - d
    slope_x_2 = b * tmp + d
    slope_x = jnp.where((a < 0.0) | (slope_x_2 > a0), slope_x_1, slope_x_2)

    s = jnp.where(u2 > 0.5, 1.0, -1.0)
    u2f = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
    z = ((u2f * (u2f * (u2f * 0.27385 - 0.73369) + 0.46341))
         / (u2f * (u2f * (u2f * 0.093073 + 0.309420) - 1.0) + 0.597999))
    slope_y = s * z * jnp.sqrt(1.0 + slope_x * slope_x)

    take_special = cos_theta > 0.9999
    return (jnp.where(take_special, special[0], slope_x),
            jnp.where(take_special, special[1], slope_y))


def tr_sample_wh(alpha, wo, u1, u2):
    """Sample a visible microfacet normal (microfacet.rs:124-190)."""
    flip = wo[..., 2] < 0.0
    w = jnp.where(flip[..., None], -wo, wo)
    ax = alpha[..., 0]
    ay = alpha[..., 1]
    stretched = m3.normalize(jnp.stack(
        [ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1))
    sx, sy = _sample11(m3.cos_theta(stretched), u1, u2)
    cp = m3.cos_phi(stretched)
    sp = m3.sin_phi(stretched)
    slope_x = cp * sx - sp * sy
    slope_y = sp * sx + cp * sy
    slope_x = ax * slope_x
    slope_y = ay * slope_y
    wh = m3.normalize(jnp.stack(
        [-slope_x, -slope_y, jnp.ones_like(slope_x)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def tr_pdf(alpha, wo, wh):
    """Visible-normal pdf of wh (microfacet.rs:192-194)."""
    return (tr_d(alpha, wh) * tr_g1(alpha, wo) * jnp.abs(m3.dot(wo, wh))
            / jnp.maximum(m3.abs_cos_theta(wo), 1e-9))
