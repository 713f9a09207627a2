"""BSDF stack: material -> lobe table, and vectorized f / pdf / sample_f.

This is the TPU-native replacement for the reference's `Bsdf` (a stack of up
to 5 `EnumBxdf` tagged unions, reflection.rs:228-343) plus the material
dispatch in material.rs. Design:

* `compute_bsdf` evaluates ALL material variants branch-free over the ray
  batch and writes a fixed 5-slot lobe SoA with an `active` mask. The 7
  generic texture slots (u0.xyzw, u1.xzw) are fetched once and re-interpreted
  per material — the same trick the reference uses with its uniform
  `EnumMaterialData` payload.
* lobe math (`lobes_f`, `lobes_pdf`, `sample_chosen`) evaluates every BxDF
  variant masked and selects by lobe tag — the `match` statements of
  reflection/bxdf.rs become jnp.where chains.
* `Bsdf` aggregation: `f` sums lobes matching the reflect/transmit side
  (reflection.rs:286-311), `pdf` averages over active lobes (:328-342),
  `sample_f` picks an active lobe uniformly and divides its pdf by the lobe
  count (:313-326).

Lobe slots per material (material.rs):
  matte: lambertian | glass: fresnel-specular | substrate: fresnel-blend |
  metal: microfacet+conductor | mirror: specular+noop |
  plastic: lambertian + microfacet(dielectric 1.5->1.0) |
  uber: opacity spec-transmission, lambertian, microfacet, spec-reflection,
        spec-transmission (each only when its weight is nonzero).

Deviations (documented):
* plastic honors `remaproughness` (the reference stores the flag in u0.z but
  reads u1.z, material.rs:650-676, so it never remaps);
* GGX visible-normal sampling uses pbrt's correct G1 (see microfacet.py).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..scene import types as T
from . import fresnel as fr
from . import math3d as m3
from . import microfacet as mf
from . import rng
from .texture import tex_color

_ONE3 = (1.0, 1.0, 1.0)

# kind bitflags per BxDF type (reflection/bxdf.rs kind() impls)
_KIND_TABLE = [
    T.KIND_REFLECTION | T.KIND_DIFFUSE,      # lambertian
    T.KIND_REFLECTION | T.KIND_TRANSMISSION,  # fresnel specular
    T.KIND_REFLECTION | T.KIND_DIFFUSE,      # fresnel blend
    T.KIND_REFLECTION | T.KIND_DIFFUSE,      # microfacet reflection
    T.KIND_REFLECTION,                        # specular reflection
    T.KIND_TRANSMISSION,                      # specular transmission
]


def lobe_kinds(lobe_type):
    table = jnp.asarray(_KIND_TABLE, dtype=jnp.int32)
    return table[lobe_type]


# ---------------------------------------------------------------------------
# Material -> lobes
# ---------------------------------------------------------------------------

def _nonzero3(v):
    return jnp.any(v != 0.0, axis=-1)


def compute_bsdf(buffers, mat_idx, uv) -> Dict[str, jnp.ndarray]:
    """Build the lobe SoA for each ray. mat_idx (N,), uv (N,2)."""
    n = mat_idx.shape[0]
    L = T.BSDF_MAX_LOBES
    mtype = buffers["mat_type"][mat_idx]
    u0 = buffers["mat_u0"][mat_idx]
    u1 = buffers["mat_u1"][mat_idx]
    v0 = buffers["mat_v0"][mat_idx]

    # generic texture slot fetches (each color is (N,3))
    t_u0x = tex_color(buffers, u0[:, 0], uv)
    t_u0y = tex_color(buffers, u0[:, 1], uv)
    t_u0z = tex_color(buffers, u0[:, 2], uv)
    t_u0w = tex_color(buffers, u0[:, 3], uv)
    t_u1x = tex_color(buffers, u1[:, 0], uv)
    t_u1z = tex_color(buffers, u1[:, 2], uv)
    t_u1w = tex_color(buffers, u1[:, 3], uv)

    z1 = jnp.zeros((n,), jnp.float32)
    z3 = jnp.zeros((n, 3), jnp.float32)
    lobes = {
        "type": jnp.zeros((n, L), jnp.int32),
        "active": jnp.zeros((n, L), bool),
        "v0": jnp.zeros((n, L, 3), jnp.float32),
        "v1": jnp.zeros((n, L, 3), jnp.float32),
        "alpha": jnp.zeros((n, L, 2), jnp.float32),
        "fr_type": jnp.full((n, L), T.FRESNEL_NOOP, jnp.int32),
        "fr_eta_i": jnp.zeros((n, L, 3), jnp.float32),
        "fr_eta_t": jnp.zeros((n, L, 3), jnp.float32),
        "fr_k": jnp.zeros((n, L, 3), jnp.float32),
    }

    def set_slot(slot, mask, ltype, v0s=None, v1s=None, alpha=None,
                 fr_type=None, fr_eta_i=None, fr_eta_t=None, fr_k=None):
        m = mask
        m1 = m[:, None]
        lobes["active"] = lobes["active"].at[:, slot].set(
            jnp.where(m, True, lobes["active"][:, slot]))
        lobes["type"] = lobes["type"].at[:, slot].set(
            jnp.where(m, ltype, lobes["type"][:, slot]))
        if v0s is not None:
            lobes["v0"] = lobes["v0"].at[:, slot].set(
                jnp.where(m1, v0s, lobes["v0"][:, slot]))
        if v1s is not None:
            lobes["v1"] = lobes["v1"].at[:, slot].set(
                jnp.where(m1, v1s, lobes["v1"][:, slot]))
        if alpha is not None:
            lobes["alpha"] = lobes["alpha"].at[:, slot].set(
                jnp.where(m1, alpha, lobes["alpha"][:, slot]))
        if fr_type is not None:
            lobes["fr_type"] = lobes["fr_type"].at[:, slot].set(
                jnp.where(m, fr_type, lobes["fr_type"][:, slot]))
        if fr_eta_i is not None:
            lobes["fr_eta_i"] = lobes["fr_eta_i"].at[:, slot].set(
                jnp.where(m1, fr_eta_i, lobes["fr_eta_i"][:, slot]))
        if fr_eta_t is not None:
            lobes["fr_eta_t"] = lobes["fr_eta_t"].at[:, slot].set(
                jnp.where(m1, fr_eta_t, lobes["fr_eta_t"][:, slot]))
        if fr_k is not None:
            lobes["fr_k"] = lobes["fr_k"].at[:, slot].set(
                jnp.where(m1, fr_k, lobes["fr_k"][:, slot]))

    def remap_alpha(flag, ru, rv):
        a = jnp.stack([ru, rv], axis=-1)
        return jnp.where((flag != 0)[:, None], mf.roughness_to_alpha(a), a)

    one3 = jnp.ones((n, 3), jnp.float32)

    # matte (material.rs:117-136)
    set_slot(0, mtype == T.MAT_MATTE, T.BXDF_LAMBERTIAN, v0s=t_u0x)

    # glass: ir in v0.x of the lobe (material.rs:332-351)
    set_slot(0, mtype == T.MAT_GLASS, T.BXDF_FRESNEL_SPECULAR,
             v0s=jnp.stack([v0[:, 0], z1, z1], -1))

    # substrate (material.rs:187-226)
    sub_alpha = remap_alpha(u1[:, 0], t_u0z[:, 0], t_u0w[:, 0])
    set_slot(0, mtype == T.MAT_SUBSTRATE, T.BXDF_FRESNEL_BLEND,
             v0s=t_u0x, v1s=t_u0y, alpha=sub_alpha)

    # metal (material.rs:278-317)
    set_slot(0, mtype == T.MAT_METAL, T.BXDF_MICROFACET_REFLECTION,
             v0s=one3, alpha=remap_alpha(u1[:, 0], t_u0z[:, 0], t_u0w[:, 0]),
             fr_type=T.FRESNEL_CONDUCTOR, fr_eta_i=one3, fr_eta_t=t_u0x,
             fr_k=t_u0y)

    # mirror (material.rs:362-383)
    set_slot(0, mtype == T.MAT_MIRROR, T.BXDF_SPECULAR_REFLECTION,
             v0s=t_u0x, fr_type=T.FRESNEL_NOOP)

    # plastic (material.rs:679-707); fresnel_dielectric(1.5, 1.0) as reference
    is_plastic = mtype == T.MAT_PLASTIC
    pl_alpha_s = jnp.where(u1[:, 2] != 0,
                           mf.roughness_to_alpha(t_u0w[:, 0]), t_u0w[:, 0])
    pl_alpha = jnp.stack([pl_alpha_s, pl_alpha_s], -1)
    set_slot(0, is_plastic & _nonzero3(t_u0x), T.BXDF_LAMBERTIAN, v0s=t_u0x)
    set_slot(1, is_plastic & _nonzero3(t_u0y), T.BXDF_MICROFACET_REFLECTION,
             v0s=t_u0y, alpha=pl_alpha, fr_type=T.FRESNEL_DIELECTRIC,
             fr_eta_i=one3 * 1.5, fr_eta_t=one3)

    # uber (material.rs:578-630)
    is_uber = mtype == T.MAT_UBER
    eta = v0[:, 0]
    op = t_u1x
    t_opacity = 1.0 - op
    kd = t_u0x
    ks = t_u0y
    kr = op * t_u0z
    kt = op * t_u0w
    uber_alpha = remap_alpha(u1[:, 1], t_u1z[:, 0], t_u1w[:, 0])
    eta3 = jnp.stack([eta, eta, eta], -1)
    set_slot(0, is_uber & _nonzero3(t_opacity), T.BXDF_SPECULAR_TRANSMISSION,
             v0s=t_opacity, v1s=one3,  # eta_a=1, eta_b=1
             fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3, fr_eta_t=one3)
    set_slot(1, is_uber & _nonzero3(kd), T.BXDF_LAMBERTIAN, v0s=kd)
    set_slot(2, is_uber & _nonzero3(ks), T.BXDF_MICROFACET_REFLECTION,
             v0s=ks, alpha=uber_alpha, fr_type=T.FRESNEL_DIELECTRIC,
             fr_eta_i=one3, fr_eta_t=eta3)
    set_slot(3, is_uber & _nonzero3(kr), T.BXDF_SPECULAR_REFLECTION,
             v0s=kr, fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3,
             fr_eta_t=eta3)
    set_slot(4, is_uber & _nonzero3(kt), T.BXDF_SPECULAR_TRANSMISSION,
             v0s=kt,
             v1s=jnp.stack([jnp.ones_like(eta), eta, z1], -1),
             fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3, fr_eta_t=eta3)

    return lobes


def material_albedo(buffers, mat_idx, uv):
    """EnumMaterial::albedo for the AOV (material.rs:719-736)."""
    mtype = buffers["mat_type"][mat_idx]
    u0 = buffers["mat_u0"][mat_idx]
    t_u0x = tex_color(buffers, u0[:, 0], uv)
    t_u0y = tex_color(buffers, u0[:, 1], uv)
    zero = jnp.zeros_like(t_u0x)
    out = jnp.where(((mtype == T.MAT_MATTE) | (mtype == T.MAT_SUBSTRATE)
                     | (mtype == T.MAT_MIRROR) | (mtype == T.MAT_UBER)
                     | (mtype == T.MAT_PLASTIC))[:, None], t_u0x, zero)
    out = jnp.where((mtype == T.MAT_METAL)[:, None], t_u0y, out)
    return out


# ---------------------------------------------------------------------------
# Per-lobe BxDF math (local frame; z = shading normal)
# ---------------------------------------------------------------------------

def _refract(wi, n, eta_ratio):
    """(ok, wt): refract wi about n (bxdf.rs:121-136)."""
    cos_i = m3.dot(n, wi)
    sin2_i = jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    sin2_t = eta_ratio * eta_ratio * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = (eta_ratio[..., None] * -wi
          + (eta_ratio * cos_i - cos_t)[..., None] * n)
    return ok, wt


def _schlick(rs, cos_theta):
    v = 1.0 - cos_theta
    v5 = (v * v) * (v * v) * v
    return rs + v5[..., None] * (1.0 - rs)


def _blend_f(lb, wo, wi):
    """FresnelBlend::f (bxdf.rs:266-290)."""
    rd = lb["v0"]
    rs = lb["v1"]
    pow5 = lambda x: (x * x) * (x * x) * x
    diffuse = ((28.0 / (23.0 * m3.PI)) * rd * (1.0 - rs)
               * (1.0 - pow5(1.0 - 0.5 * m3.abs_cos_theta(wi)))[..., None]
               * (1.0 - pow5(1.0 - 0.5 * m3.abs_cos_theta(wo)))[..., None])
    wh_raw = wi + wo
    degenerate = m3.length_squared(wh_raw) < 1e-18
    wh = m3.normalize(wh_raw)
    denom = (4.0 * jnp.abs(m3.dot(wi, wh))
             * jnp.maximum(m3.abs_cos_theta(wi), m3.abs_cos_theta(wo)))
    spec = (mf.tr_d(lb["alpha"], wh) / jnp.maximum(denom, 1e-20))[..., None] \
        * _schlick(rs, m3.dot(wi, wh))
    return jnp.where(degenerate[..., None], 0.0, diffuse + spec)


def _microfacet_f(lb, wo, wi):
    """MicrofacetReflection::f (bxdf.rs:361-383)."""
    ci = m3.abs_cos_theta(wi)
    co = m3.abs_cos_theta(wo)
    wh_raw = wi + wo
    bad = (ci == 0.0) | (co == 0.0) | (m3.length_squared(wh_raw) < 1e-18)
    wh = m3.normalize(wh_raw)
    z = jnp.zeros_like(wh)
    z = z.at[..., 2].set(1.0)
    ff = m3.face_forward(wh, z)
    f_term = fr.evaluate(lb["fr_type"], lb["fr_eta_i"], lb["fr_eta_t"],
                         lb["fr_k"], m3.dot(wi, ff))
    val = (lb["v0"] * (mf.tr_d(lb["alpha"], wh)
                       * mf.tr_g(lb["alpha"], wo, wi))[..., None] * f_term
           / jnp.maximum(4.0 * ci * co, 1e-20)[..., None])
    return jnp.where(bad[..., None], 0.0, val)


def lobes_f(lb, wo, wi):
    """Per-lobe f(wo, wi); wo/wi broadcast to lobe dims. Returns (...,L,3)."""
    lam = lb["v0"] * m3.INV_PI
    blend = _blend_f(lb, wo, wi)
    micro = _microfacet_f(lb, wo, wi)
    t = lb["type"]
    out = jnp.where((t == T.BXDF_LAMBERTIAN)[..., None], lam, 0.0)
    out = jnp.where((t == T.BXDF_FRESNEL_BLEND)[..., None], blend, out)
    out = jnp.where((t == T.BXDF_MICROFACET_REFLECTION)[..., None], micro,
                    out)
    return out


def lobes_pdf(lb, wo, wi):
    """Per-lobe pdf(wo, wi) (bxdf.rs pdf impls). Returns (...,L)."""
    same = m3.same_hemisphere(wo, wi)
    lam = jnp.where(same, m3.abs_cos_theta(wi) * m3.INV_PI, 0.0)
    wh = m3.normalize(wo + wi)
    pdf_wh = mf.tr_pdf(lb["alpha"], wo, wh)
    denom = jnp.maximum(4.0 * m3.dot(wo, wh), 1e-20)
    blend = jnp.where(same,
                      0.5 * (m3.abs_cos_theta(wi) * m3.INV_PI
                             + pdf_wh / denom), 0.0)
    micro = jnp.where(same, pdf_wh / denom, 0.0)
    t = lb["type"]
    out = jnp.where(t == T.BXDF_LAMBERTIAN, lam, 0.0)
    out = jnp.where(t == T.BXDF_FRESNEL_BLEND, blend, out)
    out = jnp.where(t == T.BXDF_MICROFACET_REFLECTION, micro, out)
    return out


def sample_chosen(lb, wo, u_coin, u1, u2):
    """Sample the (already chosen) lobe. All fields (N,...), wo (N,3).

    Returns (wi, f, pdf) — pdf NOT yet divided by the lobe count.
    Mirrors the sample_f impls in bxdf.rs with a shared 3-draw budget.
    """
    t = lb["type"]
    n = wo.shape[0]

    # cosine-hemisphere direction from (u1, u2) (math.rs:45-56)
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    phi = m3.TWO_PI * u1
    r2s = jnp.sqrt(u2)
    cos_dir = jnp.stack([jnp.cos(phi) * r2s, jnp.sin(phi) * r2s, z], -1)
    cos_dir_flipped = jnp.where((wo[:, 2] < 0.0)[:, None],
                                cos_dir * jnp.asarray([1.0, 1.0, -1.0]),
                                cos_dir)

    wh = mf.tr_sample_wh(lb["alpha"], wo, u1, u2)
    wi_spec = jnp.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], -1)

    # --- lambertian (bxdf.rs:91-105)
    lam_wi = cos_dir_flipped
    lam_pdf = jnp.where(m3.same_hemisphere(wo, lam_wi),
                        m3.abs_cos_theta(lam_wi) * m3.INV_PI, 0.0)
    lam_f = lb["v0"] * m3.INV_PI

    # --- fresnel specular / glass (bxdf.rs:193-226)
    ir = lb["v0"][:, 0]
    f_diel = fr.fr_dielectric(m3.cos_theta(wo), jnp.ones_like(ir), ir)
    take_refl = u_coin < f_diel
    fs_wi_r = wi_spec
    entering = m3.cos_theta(wo) > 0.0
    eta_ratio = jnp.where(entering, 1.0 / jnp.maximum(ir, 1e-9),
                          ir)
    nz = jnp.where(wo[:, 2] > 0.0, 1.0, -1.0)
    n_vec = jnp.stack([jnp.zeros(n), jnp.zeros(n), nz], -1)
    ok_t, fs_wi_t = _refract(wo, n_vec, eta_ratio)
    fs_wi = jnp.where(take_refl[:, None], fs_wi_r, fs_wi_t)
    fs_val_r = f_diel / jnp.maximum(m3.abs_cos_theta(fs_wi_r), 1e-9)
    fs_val_t = (1.0 - f_diel) / jnp.maximum(m3.abs_cos_theta(fs_wi_t), 1e-9)
    fs_f = jnp.where(take_refl, fs_val_r, fs_val_t)[:, None] * jnp.ones(3)
    fs_pdf = jnp.where(take_refl, f_diel,
                       jnp.where(ok_t, 1.0 - f_diel, 0.0))

    # --- fresnel blend (bxdf.rs:292-317)
    fb_take_cos = u_coin < 0.5
    fb_wi_spec = m3.reflect(wo, wh)
    fb_wi = jnp.where(fb_take_cos[:, None], cos_dir_flipped, fb_wi_spec)
    fb_bad = ~fb_take_cos & ~m3.same_hemisphere(wo, fb_wi_spec)
    fb_f = jnp.where(fb_bad[:, None], 0.0, _blend_f(lb, wo, fb_wi))
    fb_wh = m3.normalize(wo + fb_wi)
    fb_pdf_wh = mf.tr_pdf(lb["alpha"], wo, fb_wh)
    fb_pdf = jnp.where(
        fb_bad | ~m3.same_hemisphere(wo, fb_wi), 0.0,
        0.5 * (m3.abs_cos_theta(fb_wi) * m3.INV_PI
               + fb_pdf_wh / jnp.maximum(4.0 * m3.dot(wo, fb_wh), 1e-20)))

    # --- microfacet reflection (bxdf.rs:385-406)
    mr_wi = m3.reflect(wo, wh)
    mr_bad = ((wo[:, 2] == 0.0) | (m3.dot(wo, wh) < 0.0)
              | ~m3.same_hemisphere(wo, mr_wi))
    mr_pdf = jnp.where(mr_bad, 0.0,
                       mf.tr_pdf(lb["alpha"], wo, wh)
                       / jnp.maximum(4.0 * m3.dot(wo, wh), 1e-20))
    mr_f = jnp.where(mr_bad[:, None], 0.0, _microfacet_f(lb, wo, mr_wi))

    # --- specular reflection (bxdf.rs:437-443)
    sr_f = (fr.evaluate(lb["fr_type"], lb["fr_eta_i"], lb["fr_eta_t"],
                        lb["fr_k"], m3.cos_theta(wi_spec)) * lb["v0"]
            / jnp.maximum(m3.abs_cos_theta(wi_spec), 1e-9)[:, None])

    # --- specular transmission (bxdf.rs:481-512)
    st_eta_a = lb["v1"][:, 0]
    st_eta_b = lb["v1"][:, 1]
    st_entering = m3.cos_theta(wo) > 0.0
    st_ei = jnp.where(st_entering, st_eta_a, st_eta_b)
    st_et = jnp.where(st_entering, st_eta_b, st_eta_a)
    st_ok, st_wi = _refract(wo, n_vec, st_ei / jnp.maximum(st_et, 1e-9))
    st_fr = fr.fr_dielectric(m3.cos_theta(st_wi), st_eta_a, st_eta_b)
    st_f = jnp.where(
        st_ok[:, None],
        lb["v0"] * (1.0 - st_fr[:, None])
        / jnp.maximum(m3.abs_cos_theta(st_wi), 1e-9)[:, None],
        0.0)
    st_pdf = jnp.where(st_ok, 1.0, 0.0)

    t1 = t[:, None]
    wi = jnp.where(t1 == T.BXDF_LAMBERTIAN, lam_wi, wi_spec)
    wi = jnp.where(t1 == T.BXDF_FRESNEL_SPECULAR, fs_wi, wi)
    wi = jnp.where(t1 == T.BXDF_FRESNEL_BLEND, fb_wi, wi)
    wi = jnp.where(t1 == T.BXDF_MICROFACET_REFLECTION, mr_wi, wi)
    wi = jnp.where(t1 == T.BXDF_SPECULAR_TRANSMISSION, st_wi, wi)

    f = jnp.where(t1 == T.BXDF_LAMBERTIAN, lam_f, 0.0)
    f = jnp.where(t1 == T.BXDF_FRESNEL_SPECULAR, fs_f, f)
    f = jnp.where(t1 == T.BXDF_FRESNEL_BLEND, fb_f, f)
    f = jnp.where(t1 == T.BXDF_MICROFACET_REFLECTION, mr_f, f)
    f = jnp.where(t1 == T.BXDF_SPECULAR_REFLECTION, sr_f, f)
    f = jnp.where(t1 == T.BXDF_SPECULAR_TRANSMISSION, st_f, f)

    pdf = jnp.where(t == T.BXDF_LAMBERTIAN, lam_pdf, 0.0)
    pdf = jnp.where(t == T.BXDF_FRESNEL_SPECULAR, fs_pdf, pdf)
    pdf = jnp.where(t == T.BXDF_FRESNEL_BLEND, fb_pdf, pdf)
    pdf = jnp.where(t == T.BXDF_MICROFACET_REFLECTION, mr_pdf, pdf)
    pdf = jnp.where(t == T.BXDF_SPECULAR_REFLECTION, 1.0, pdf)
    pdf = jnp.where(t == T.BXDF_SPECULAR_TRANSMISSION, st_pdf, pdf)

    return wi, f, pdf


# ---------------------------------------------------------------------------
# Bsdf aggregate (world-space interface)
# ---------------------------------------------------------------------------

def bsdf_contains(lobes, kind):
    """Bsdf::contains (reflection.rs:268-283)."""
    has = (lobe_kinds(lobes["type"]) & kind) != 0
    return jnp.any(has & lobes["active"], axis=-1)


def bsdf_num_lobes(lobes):
    return jnp.sum(lobes["active"].astype(jnp.int32), axis=-1)


def bsdf_f(lobes, onb, ng, wo_world, wi_world):
    """Bsdf::f (reflection.rs:286-311): sum lobes on the reflect/transmit
    side of the *geometric* normal."""
    u, v, w = onb
    wo = m3.to_local(u, v, w, wo_world)
    wi = m3.to_local(u, v, w, wi_world)
    reflect = (m3.dot(wi_world, ng) * m3.dot(wo_world, ng)) > 0.0
    kinds = lobe_kinds(lobes["type"])
    match = jnp.where(reflect[..., None],
                      (kinds & T.KIND_REFLECTION) != 0,
                      (kinds & T.KIND_TRANSMISSION) != 0)
    per_lobe = lobes_f(lobes, wo[..., None, :], wi[..., None, :])
    mask = (match & lobes["active"])[..., None]
    f = jnp.sum(jnp.where(mask, per_lobe, 0.0), axis=-2)
    return jnp.where((wo[..., 2] == 0.0)[..., None], 0.0, f)


def bsdf_pdf(lobes, onb, wo_world, wi_world):
    """Bsdf::pdf (reflection.rs:328-342): average over active lobes."""
    u, v, w = onb
    wo = m3.to_local(u, v, w, wo_world)
    wi = m3.to_local(u, v, w, wi_world)
    per_lobe = lobes_pdf(lobes, wo[..., None, :], wi[..., None, :])
    num = jnp.maximum(bsdf_num_lobes(lobes), 1)
    total = jnp.sum(jnp.where(lobes["active"], per_lobe, 0.0), axis=-1)
    return total / num.astype(jnp.float32)


def bsdf_sample_f(lobes, onb, wo_world, state):
    """Bsdf::sample_f (reflection.rs:313-326): uniform active-lobe choice.

    Returns (wi_world, f, pdf, new_rng_state); pdf already divided by the
    lobe count; all-zero when no lobes are active.
    """
    u, v, w = onb
    wo = m3.to_local(u, v, w, wo_world)
    num = bsdf_num_lobes(lobes)
    uidx, state = rng.next_u32(state)
    j = (uidx % jnp.maximum(num, 1).astype(jnp.uint32)).astype(jnp.int32)
    # j-th active slot: rank = exclusive cumsum of active
    rank = jnp.cumsum(lobes["active"].astype(jnp.int32), axis=-1) - 1
    sel = lobes["active"] & (rank == j[..., None])
    slot = jnp.argmax(sel, axis=-1)

    def gather_slot(val):
        idx = slot.reshape(slot.shape + (1,) * (val.ndim - 1))
        return jnp.take_along_axis(val, idx, axis=1)[:, 0]

    chosen = {k: gather_slot(val) for k, val in lobes.items()}

    u_coin, state = rng.next_f32(state)
    u1, state = rng.next_f32(state)
    u2, state = rng.next_f32(state)
    wi, f, pdf = sample_chosen(chosen, wo, u_coin, u1, u2)
    pdf = pdf / jnp.maximum(num, 1).astype(jnp.float32)
    empty = num == 0
    wi_world = m3.to_world(u, v, w, wi)
    return (jnp.where(empty[:, None], 0.0, wi_world),
            jnp.where(empty[:, None], 0.0, f),
            jnp.where(empty, 0.0, pdf),
            state)
