"""BSDF stack: material -> lobe table, and vectorized f / pdf / sample_f.

This is the TPU-native replacement for the reference's `Bsdf` (a stack of up
to 5 `EnumBxdf` tagged unions, reflection.rs:228-343) plus the material
dispatch in material.rs. Design:

* **Scene-specialized compilation**: every function takes the static
  `RenderConfig` and only emits code for the material / BxDF / texture
  variants present in the scene (`config.mat_types`, `config.max_lobes`) —
  a pure-matte scene (cornell-box) compiles a single-slot Lambertian BSDF
  with zero dead branches. This is the TPU analogue of specializing shader
  pipelines per scene.
* `compute_bsdf` evaluates the present material variants branch-free over
  the ray batch and writes a `max_lobes`-slot lobe SoA with an `active`
  mask. The generic texture slots (u0.xyzw, u1.xzw) are fetched once and
  re-interpreted per material — the same trick the reference plays with its
  uniform `EnumMaterialData` payload.
* Lobe math evaluates the present BxDF variants masked and selects by lobe
  tag — the `match` statements of reflection/bxdf.rs become jnp.where
  chains over only the live variants.
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
import numpy as np

from ..scene import types as T
from . import fresnel as fr
from . import math3d as m3
from . import microfacet as mf
from . import rng
from .texture import tex_color

# kind bitflags per BxDF type (reflection/bxdf.rs kind() impls)
_KIND_TABLE = np.asarray([
    T.KIND_REFLECTION | T.KIND_DIFFUSE,      # lambertian
    T.KIND_REFLECTION | T.KIND_TRANSMISSION,  # fresnel specular
    T.KIND_REFLECTION | T.KIND_DIFFUSE,      # fresnel blend
    T.KIND_REFLECTION | T.KIND_DIFFUSE,      # microfacet reflection
    T.KIND_REFLECTION,                        # specular reflection
    T.KIND_TRANSMISSION,                      # specular transmission
], dtype=np.int32)

_MAT_LOBES = {
    T.MAT_NONE: (),
    T.MAT_MATTE: (T.BXDF_LAMBERTIAN,),
    T.MAT_GLASS: (T.BXDF_FRESNEL_SPECULAR,),
    T.MAT_SUBSTRATE: (T.BXDF_FRESNEL_BLEND,),
    T.MAT_METAL: (T.BXDF_MICROFACET_REFLECTION,),
    T.MAT_MIRROR: (T.BXDF_SPECULAR_REFLECTION,),
    T.MAT_UBER: (T.BXDF_SPECULAR_TRANSMISSION, T.BXDF_LAMBERTIAN,
                 T.BXDF_MICROFACET_REFLECTION, T.BXDF_SPECULAR_REFLECTION),
    T.MAT_PLASTIC: (T.BXDF_LAMBERTIAN, T.BXDF_MICROFACET_REFLECTION),
}

# texture payload slots each material reads (0..3 = u0.xyzw, 4..6 = u1.x/z/w)
_MAT_FETCHES = {
    T.MAT_NONE: (),
    T.MAT_MATTE: (0,),
    T.MAT_GLASS: (),
    T.MAT_SUBSTRATE: (0, 1, 2, 3),
    T.MAT_METAL: (0, 1, 2, 3),
    T.MAT_MIRROR: (0,),
    T.MAT_UBER: (0, 1, 2, 3, 4, 5, 6),
    T.MAT_PLASTIC: (0, 1, 3),
}


def lobe_types_for(config):
    out = []
    for mt in config.mat_types:
        for lt in _MAT_LOBES[mt]:
            if lt not in out:
                out.append(lt)
    return tuple(sorted(out))


def lobe_kinds(lobe_type):
    return jnp.asarray(_KIND_TABLE)[lobe_type]


def _nonzero3(v):
    return jnp.any(v != 0.0, axis=-1)


# ---------------------------------------------------------------------------
# Material -> lobes
# ---------------------------------------------------------------------------

def compute_bsdf(buffers, mat_idx, uv, config) -> Dict[str, jnp.ndarray]:
    """Build the lobe SoA for each ray. mat_idx (N,), uv (N,2)."""
    n = mat_idx.shape[0]
    L = config.max_lobes
    mats = set(config.mat_types)
    mtype = buffers["mat_type"][mat_idx]
    u0 = buffers["mat_u0"][mat_idx]
    u1 = buffers["mat_u1"][mat_idx]
    v0 = buffers["mat_v0"][mat_idx]

    # generic texture slot fetches — only those some present material reads
    need = set()
    for mt in mats:
        need.update(_MAT_FETCHES[mt])
    zero3 = jnp.zeros((n, 3), jnp.float32)

    def fetch(slot, idx):
        if slot not in need:
            return zero3
        return tex_color(buffers, idx, uv, config)

    t_u0x = fetch(0, u0[:, 0])
    t_u0y = fetch(1, u0[:, 1])
    t_u0z = fetch(2, u0[:, 2])
    t_u0w = fetch(3, u0[:, 3])
    t_u1x = fetch(4, u1[:, 0])
    t_u1z = fetch(5, u1[:, 2])
    t_u1w = fetch(6, u1[:, 3])

    z1 = jnp.zeros((n,), jnp.float32)
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
        for key, val in (("v0", v0s), ("v1", v1s), ("alpha", alpha),
                         ("fr_eta_i", fr_eta_i), ("fr_eta_t", fr_eta_t),
                         ("fr_k", fr_k)):
            if val is not None:
                lobes[key] = lobes[key].at[:, slot].set(
                    jnp.where(m1, val, lobes[key][:, slot]))
        if fr_type is not None:
            lobes["fr_type"] = lobes["fr_type"].at[:, slot].set(
                jnp.where(m, fr_type, lobes["fr_type"][:, slot]))

    def remap_alpha(flag, ru, rv):
        a = jnp.stack([ru, rv], axis=-1)
        return jnp.where((flag != 0)[:, None], mf.roughness_to_alpha(a), a)

    one3 = jnp.ones((n, 3), jnp.float32)

    if T.MAT_MATTE in mats:  # material.rs:117-136
        set_slot(0, mtype == T.MAT_MATTE, T.BXDF_LAMBERTIAN, v0s=t_u0x)

    if T.MAT_GLASS in mats:  # ir in lobe v0.x (material.rs:332-351)
        set_slot(0, mtype == T.MAT_GLASS, T.BXDF_FRESNEL_SPECULAR,
                 v0s=jnp.stack([v0[:, 0], z1, z1], -1))

    if T.MAT_SUBSTRATE in mats:  # material.rs:187-226
        set_slot(0, mtype == T.MAT_SUBSTRATE, T.BXDF_FRESNEL_BLEND,
                 v0s=t_u0x, v1s=t_u0y,
                 alpha=remap_alpha(u1[:, 0], t_u0z[:, 0], t_u0w[:, 0]))

    if T.MAT_METAL in mats:  # material.rs:278-317
        set_slot(0, mtype == T.MAT_METAL, T.BXDF_MICROFACET_REFLECTION,
                 v0s=one3,
                 alpha=remap_alpha(u1[:, 0], t_u0z[:, 0], t_u0w[:, 0]),
                 fr_type=T.FRESNEL_CONDUCTOR, fr_eta_i=one3, fr_eta_t=t_u0x,
                 fr_k=t_u0y)

    if T.MAT_MIRROR in mats:  # material.rs:362-383
        set_slot(0, mtype == T.MAT_MIRROR, T.BXDF_SPECULAR_REFLECTION,
                 v0s=t_u0x, fr_type=T.FRESNEL_NOOP)

    if T.MAT_PLASTIC in mats:  # material.rs:679-707; dielectric(1.5 -> 1.0)
        is_plastic = mtype == T.MAT_PLASTIC
        pl_a = jnp.where(u1[:, 2] != 0,
                         mf.roughness_to_alpha(t_u0w[:, 0]), t_u0w[:, 0])
        set_slot(0, is_plastic & _nonzero3(t_u0x), T.BXDF_LAMBERTIAN,
                 v0s=t_u0x)
        set_slot(1, is_plastic & _nonzero3(t_u0y),
                 T.BXDF_MICROFACET_REFLECTION, v0s=t_u0y,
                 alpha=jnp.stack([pl_a, pl_a], -1),
                 fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3 * 1.5,
                 fr_eta_t=one3)

    if T.MAT_UBER in mats:  # material.rs:578-630
        is_uber = mtype == T.MAT_UBER
        eta = v0[:, 0]
        op = t_u1x
        t_opacity = 1.0 - op
        kr = op * t_u0z
        kt = op * t_u0w
        uber_alpha = remap_alpha(u1[:, 1], t_u1z[:, 0], t_u1w[:, 0])
        eta3 = jnp.stack([eta, eta, eta], -1)
        set_slot(0, is_uber & _nonzero3(t_opacity),
                 T.BXDF_SPECULAR_TRANSMISSION, v0s=t_opacity, v1s=one3,
                 fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3, fr_eta_t=one3)
        set_slot(1, is_uber & _nonzero3(t_u0x), T.BXDF_LAMBERTIAN, v0s=t_u0x)
        set_slot(2, is_uber & _nonzero3(t_u0y),
                 T.BXDF_MICROFACET_REFLECTION, v0s=t_u0y, alpha=uber_alpha,
                 fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3, fr_eta_t=eta3)
        set_slot(3, is_uber & _nonzero3(kr), T.BXDF_SPECULAR_REFLECTION,
                 v0s=kr, fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3,
                 fr_eta_t=eta3)
        set_slot(4, is_uber & _nonzero3(kt), T.BXDF_SPECULAR_TRANSMISSION,
                 v0s=kt,
                 v1s=jnp.stack([jnp.ones_like(eta), eta, z1], -1),
                 fr_type=T.FRESNEL_DIELECTRIC, fr_eta_i=one3, fr_eta_t=eta3)

    return lobes


def material_albedo(buffers, mat_idx, uv, config):
    """EnumMaterial::albedo for the AOV (material.rs:719-736)."""
    mtype = buffers["mat_type"][mat_idx]
    u0 = buffers["mat_u0"][mat_idx]
    t_u0x = tex_color(buffers, u0[:, 0], uv, config)
    zero = jnp.zeros_like(t_u0x)
    out = jnp.where(((mtype == T.MAT_MATTE) | (mtype == T.MAT_SUBSTRATE)
                     | (mtype == T.MAT_MIRROR) | (mtype == T.MAT_UBER)
                     | (mtype == T.MAT_PLASTIC))[:, None], t_u0x, zero)
    if T.MAT_METAL in config.mat_types:
        t_u0y = tex_color(buffers, u0[:, 1], uv, config)
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


def lobes_f(lb, wo, wi, lobe_types):
    """Per-lobe f(wo, wi); wo/wi broadcast to lobe dims. (...,L,3)."""
    t = lb["type"]
    out = jnp.zeros(lb["v0"].shape, lb["v0"].dtype)
    if T.BXDF_LAMBERTIAN in lobe_types:
        out = jnp.where((t == T.BXDF_LAMBERTIAN)[..., None],
                        lb["v0"] * m3.INV_PI, out)
    if T.BXDF_FRESNEL_BLEND in lobe_types:
        out = jnp.where((t == T.BXDF_FRESNEL_BLEND)[..., None],
                        _blend_f(lb, wo, wi), out)
    if T.BXDF_MICROFACET_REFLECTION in lobe_types:
        out = jnp.where((t == T.BXDF_MICROFACET_REFLECTION)[..., None],
                        _microfacet_f(lb, wo, wi), out)
    return out


def lobes_pdf(lb, wo, wi, lobe_types):
    """Per-lobe pdf(wo, wi) (bxdf.rs pdf impls). (...,L)."""
    t = lb["type"]
    same = m3.same_hemisphere(wo, wi)
    out = jnp.zeros(lb["type"].shape, jnp.float32)
    if T.BXDF_LAMBERTIAN in lobe_types:
        lam = jnp.where(same, m3.abs_cos_theta(wi) * m3.INV_PI, 0.0)
        out = jnp.where(t == T.BXDF_LAMBERTIAN, lam, out)
    needs_wh = (T.BXDF_FRESNEL_BLEND in lobe_types
                or T.BXDF_MICROFACET_REFLECTION in lobe_types)
    if needs_wh:
        wh = m3.normalize(wo + wi)
        pdf_wh = mf.tr_pdf(lb["alpha"], wo, wh)
        denom = jnp.maximum(4.0 * m3.dot(wo, wh), 1e-20)
    if T.BXDF_FRESNEL_BLEND in lobe_types:
        blend = jnp.where(same, 0.5 * (m3.abs_cos_theta(wi) * m3.INV_PI
                                       + pdf_wh / denom), 0.0)
        out = jnp.where(t == T.BXDF_FRESNEL_BLEND, blend, out)
    if T.BXDF_MICROFACET_REFLECTION in lobe_types:
        micro = jnp.where(same, pdf_wh / denom, 0.0)
        out = jnp.where(t == T.BXDF_MICROFACET_REFLECTION, micro, out)
    return out


def sample_chosen(lb, wo, u_coin, u1, u2, lobe_types):
    """Sample the (already chosen) lobe. All fields (N,...), wo (N,3).

    Returns (wi, f, pdf) — pdf NOT yet divided by the lobe count.
    Mirrors the sample_f impls in bxdf.rs with a shared 3-draw budget.
    """
    t = lb["type"]
    t1 = t[:, None]
    n = wo.shape[0]
    wi = jnp.zeros((n, 3), jnp.float32)
    f = jnp.zeros((n, 3), jnp.float32)
    pdf = jnp.zeros((n,), jnp.float32)

    needs_cos = (T.BXDF_LAMBERTIAN in lobe_types
                 or T.BXDF_FRESNEL_BLEND in lobe_types)
    if needs_cos:
        # cosine-hemisphere direction from (u1, u2) (math.rs:45-56)
        zc = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
        phi = m3.TWO_PI * u1
        r2s = jnp.sqrt(u2)
        cos_dir = jnp.stack([jnp.cos(phi) * r2s, jnp.sin(phi) * r2s, zc], -1)
        cos_dir = jnp.where((wo[:, 2] < 0.0)[:, None],
                            cos_dir * jnp.asarray([1.0, 1.0, -1.0]), cos_dir)

    needs_wh = (T.BXDF_FRESNEL_BLEND in lobe_types
                or T.BXDF_MICROFACET_REFLECTION in lobe_types)
    if needs_wh:
        wh = mf.tr_sample_wh(lb["alpha"], wo, u1, u2)

    needs_spec = (T.BXDF_FRESNEL_SPECULAR in lobe_types
                  or T.BXDF_SPECULAR_REFLECTION in lobe_types)
    if needs_spec:
        wi_spec = jnp.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], -1)

    needs_refract = (T.BXDF_FRESNEL_SPECULAR in lobe_types
                     or T.BXDF_SPECULAR_TRANSMISSION in lobe_types)
    if needs_refract:
        nz = jnp.where(wo[:, 2] > 0.0, 1.0, -1.0)
        n_vec = jnp.stack([jnp.zeros(n), jnp.zeros(n), nz], -1)

    if T.BXDF_LAMBERTIAN in lobe_types:  # bxdf.rs:91-105
        sel = t == T.BXDF_LAMBERTIAN
        lam_pdf = jnp.where(m3.same_hemisphere(wo, cos_dir),
                            m3.abs_cos_theta(cos_dir) * m3.INV_PI, 0.0)
        wi = jnp.where(sel[:, None], cos_dir, wi)
        f = jnp.where(sel[:, None], lb["v0"] * m3.INV_PI, f)
        pdf = jnp.where(sel, lam_pdf, pdf)

    if T.BXDF_FRESNEL_SPECULAR in lobe_types:  # bxdf.rs:193-226
        sel = t == T.BXDF_FRESNEL_SPECULAR
        ir = lb["v0"][:, 0]
        f_diel = fr.fr_dielectric(m3.cos_theta(wo), jnp.ones_like(ir), ir)
        take_refl = u_coin < f_diel
        entering = m3.cos_theta(wo) > 0.0
        eta_ratio = jnp.where(entering, 1.0 / jnp.maximum(ir, 1e-9), ir)
        ok_t, fs_wi_t = _refract(wo, n_vec, eta_ratio)
        fs_wi = jnp.where(take_refl[:, None], wi_spec, fs_wi_t)
        fs_val_r = f_diel / jnp.maximum(m3.abs_cos_theta(wi_spec), 1e-9)
        fs_val_t = (1.0 - f_diel) / jnp.maximum(m3.abs_cos_theta(fs_wi_t),
                                                1e-9)
        fs_f = jnp.where(take_refl, fs_val_r, fs_val_t)[:, None] \
            * jnp.ones(3)
        fs_pdf = jnp.where(take_refl, f_diel,
                           jnp.where(ok_t, 1.0 - f_diel, 0.0))
        wi = jnp.where(sel[:, None], fs_wi, wi)
        f = jnp.where(sel[:, None], fs_f, f)
        pdf = jnp.where(sel, fs_pdf, pdf)

    if T.BXDF_FRESNEL_BLEND in lobe_types:  # bxdf.rs:292-317
        sel = t == T.BXDF_FRESNEL_BLEND
        fb_take_cos = u_coin < 0.5
        fb_wi_spec = m3.reflect(wo, wh)
        fb_wi = jnp.where(fb_take_cos[:, None], cos_dir, fb_wi_spec)
        fb_bad = ~fb_take_cos & ~m3.same_hemisphere(wo, fb_wi_spec)
        fb_f = jnp.where(fb_bad[:, None], 0.0, _blend_f(lb, wo, fb_wi))
        fb_wh = m3.normalize(wo + fb_wi)
        fb_pdf_wh = mf.tr_pdf(lb["alpha"], wo, fb_wh)
        fb_pdf = jnp.where(
            fb_bad | ~m3.same_hemisphere(wo, fb_wi), 0.0,
            0.5 * (m3.abs_cos_theta(fb_wi) * m3.INV_PI
                   + fb_pdf_wh / jnp.maximum(4.0 * m3.dot(wo, fb_wh),
                                             1e-20)))
        wi = jnp.where(sel[:, None], fb_wi, wi)
        f = jnp.where(sel[:, None], fb_f, f)
        pdf = jnp.where(sel, fb_pdf, pdf)

    if T.BXDF_MICROFACET_REFLECTION in lobe_types:  # bxdf.rs:385-406
        sel = t == T.BXDF_MICROFACET_REFLECTION
        mr_wi = m3.reflect(wo, wh)
        mr_bad = ((wo[:, 2] == 0.0) | (m3.dot(wo, wh) < 0.0)
                  | ~m3.same_hemisphere(wo, mr_wi))
        mr_pdf = jnp.where(mr_bad, 0.0,
                           mf.tr_pdf(lb["alpha"], wo, wh)
                           / jnp.maximum(4.0 * m3.dot(wo, wh), 1e-20))
        mr_f = jnp.where(mr_bad[:, None], 0.0, _microfacet_f(lb, wo, mr_wi))
        wi = jnp.where(sel[:, None], mr_wi, wi)
        f = jnp.where(sel[:, None], mr_f, f)
        pdf = jnp.where(sel, mr_pdf, pdf)

    if T.BXDF_SPECULAR_REFLECTION in lobe_types:  # bxdf.rs:437-443
        sel = t == T.BXDF_SPECULAR_REFLECTION
        sr_f = (fr.evaluate(lb["fr_type"], lb["fr_eta_i"], lb["fr_eta_t"],
                            lb["fr_k"], m3.cos_theta(wi_spec)) * lb["v0"]
                / jnp.maximum(m3.abs_cos_theta(wi_spec), 1e-9)[:, None])
        wi = jnp.where(sel[:, None], wi_spec, wi)
        f = jnp.where(sel[:, None], sr_f, f)
        pdf = jnp.where(sel, 1.0, pdf)

    if T.BXDF_SPECULAR_TRANSMISSION in lobe_types:  # bxdf.rs:481-512
        sel = t == T.BXDF_SPECULAR_TRANSMISSION
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
            / jnp.maximum(m3.abs_cos_theta(st_wi), 1e-9)[:, None], 0.0)
        wi = jnp.where(sel[:, None], st_wi, wi)
        f = jnp.where(sel[:, None], st_f, f)
        pdf = jnp.where(sel, jnp.where(st_ok, 1.0, 0.0), pdf)

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


def bsdf_f(lobes, onb, ng, wo_world, wi_world, config):
    """Bsdf::f (reflection.rs:286-311): sum lobes on the reflect/transmit
    side of the *geometric* normal."""
    lobe_types = lobe_types_for(config)
    u, v, w = onb
    wo = m3.to_local(u, v, w, wo_world)
    wi = m3.to_local(u, v, w, wi_world)
    reflect = (m3.dot(wi_world, ng) * m3.dot(wo_world, ng)) > 0.0
    kinds = lobe_kinds(lobes["type"])
    match = jnp.where(reflect[..., None],
                      (kinds & T.KIND_REFLECTION) != 0,
                      (kinds & T.KIND_TRANSMISSION) != 0)
    per_lobe = lobes_f(lobes, wo[..., None, :], wi[..., None, :], lobe_types)
    mask = (match & lobes["active"])[..., None]
    f = jnp.sum(jnp.where(mask, per_lobe, 0.0), axis=-2)
    return jnp.where((wo[..., 2] == 0.0)[..., None], 0.0, f)


def bsdf_pdf(lobes, onb, wo_world, wi_world, config):
    """Bsdf::pdf (reflection.rs:328-342): average over active lobes."""
    lobe_types = lobe_types_for(config)
    u, v, w = onb
    wo = m3.to_local(u, v, w, wo_world)
    wi = m3.to_local(u, v, w, wi_world)
    per_lobe = lobes_pdf(lobes, wo[..., None, :], wi[..., None, :],
                         lobe_types)
    num = jnp.maximum(bsdf_num_lobes(lobes), 1)
    total = jnp.sum(jnp.where(lobes["active"], per_lobe, 0.0), axis=-1)
    return total / num.astype(jnp.float32)


def bsdf_sample_f(lobes, onb, wo_world, state, config):
    """Bsdf::sample_f (reflection.rs:313-326): uniform active-lobe choice.

    Returns (wi_world, f, pdf, new_rng_state); pdf already divided by the
    lobe count; all-zero when no lobes are active.
    """
    lobe_types = lobe_types_for(config)
    u, v, w = onb
    wo = m3.to_local(u, v, w, wo_world)
    num = bsdf_num_lobes(lobes)

    if config.max_lobes == 1:
        chosen = {k: val[:, 0] for k, val in lobes.items()}
        state2 = state
    else:
        uidx, state2 = rng.next_u32(state)
        j = (uidx % jnp.maximum(num, 1).astype(jnp.uint32)).astype(jnp.int32)
        # j-th active slot: rank = exclusive cumsum of active
        rank = jnp.cumsum(lobes["active"].astype(jnp.int32), axis=-1) - 1
        sel = lobes["active"] & (rank == j[..., None])
        slot = jnp.argmax(sel, axis=-1)

        def gather_slot(val):
            idx = slot.reshape(slot.shape + (1,) * (val.ndim - 1))
            return jnp.take_along_axis(val, idx, axis=1)[:, 0]

        chosen = {k: gather_slot(val) for k, val in lobes.items()}

    u_coin, state2 = rng.next_f32(state2)
    u1, state2 = rng.next_f32(state2)
    u2, state2 = rng.next_f32(state2)
    wi, f, pdf = sample_chosen(chosen, wo, u_coin, u1, u2, lobe_types)
    pdf = pdf / jnp.maximum(num, 1).astype(jnp.float32)
    empty = num == 0
    wi_world = m3.to_world(u, v, w, wi)
    return (jnp.where(empty[:, None], 0.0, wi_world),
            jnp.where(empty[:, None], 0.0, f),
            jnp.where(empty, 0.0, pdf),
            state2)
