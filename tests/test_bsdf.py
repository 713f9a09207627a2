"""BSDF numerical tests: furnace, pdf normalization, Fresnel identities."""
import jax.numpy as jnp
import numpy as np
import pytest

from rene_tpu.ops import bsdf as B
from rene_tpu.ops import fresnel as fr
from rene_tpu.ops import vec3 as v3
from rene_tpu.ops.vec3 import V3
from rene_tpu.ops import microfacet as mf
from rene_tpu.ops import rng
from rene_tpu.scene import types as T


import dataclasses


@dataclasses.dataclass
class FakeConfig:
    mat_types: tuple
    tex_types: tuple = (T.TEX_SOLID,)
    max_lobes: int = 5


def make_buffers(mat_type, u0=(0, 0, 0, 0), u1=(0, 0, 0, 0),
                 v0=(0.0, 0.0, 0.0, 0.0), tex_colors=((1.0, 1.0, 1.0),)):
    """Minimal buffers dict: one material + solid textures."""
    ntex = len(tex_colors)
    return {
        "mat_type": jnp.asarray([mat_type], jnp.int32),
        "mat_u0": jnp.asarray([u0], jnp.int32),
        "mat_u1": jnp.asarray([u1], jnp.int32),
        "mat_v0": jnp.asarray([v0], jnp.float32),
        "tex_type": jnp.full((ntex,), T.TEX_SOLID, jnp.int32),
        "tex_u0": jnp.zeros((ntex, 4), jnp.int32),
        "tex_v0": jnp.asarray([list(c) + [0.0] for c in tex_colors],
                              jnp.float32),
        "img_atlasT": jnp.zeros((4, 1), jnp.float32),
        "img_offset": jnp.zeros((1,), jnp.int32),
        "img_width": jnp.ones((1,), jnp.int32),
        "img_height": jnp.ones((1,), jnp.int32),
        "tex_v0T": jnp.asarray([list(c) + [0.0] for c in tex_colors],
                               jnp.float32).T,
    }


def lobes_for(buffers, n):
    mat_idx = jnp.zeros((n,), jnp.int32)
    uv = jnp.zeros((n, 2), jnp.float32)
    cfg = FakeConfig(mat_types=(int(buffers["mat_type"][0]),))
    return B.compute_bsdf(buffers, mat_idx, uv, cfg), cfg


def default_frame(n):
    z = jnp.zeros((n,))
    normal = V3(z, z, jnp.ones((n,)))
    return v3.Onb.from_w(normal), normal


def test_matte_single_lambertian_lobe():
    buffers = make_buffers(T.MAT_MATTE, u0=(0, 0, 0, 0),
                           tex_colors=((0.7, 0.2, 0.2),))
    lobes, cfg = lobes_for(buffers, 1)
    assert int(B.bsdf_num_lobes(lobes)[0]) == 1
    assert int(lobes[0]["type"][0]) == T.BXDF_LAMBERTIAN
    assert bool(B.bsdf_contains(lobes, T.KIND_DIFFUSE)[0])
    np.testing.assert_allclose(np.asarray(lobes[0]["v0"].to_array()[0]),
                               [0.7, 0.2, 0.2], rtol=1e-6)


def test_uber_lobe_count():
    # defaults: opacity=1 -> no opacity lobe; kd, ks nonzero; kr=kt=0
    buffers = make_buffers(
        T.MAT_UBER, u0=(1, 1, 0, 0), u1=(2, 1, 3, 3),
        v0=(1.5, 0, 0, 0),
        tex_colors=((0.0, 0.0, 0.0),      # 0: zero (kr/kt)
                    (0.25, 0.25, 0.25),    # 1: kd/ks
                    (1.0, 1.0, 1.0),       # 2: opacity
                    (0.1, 0.1, 0.1)))      # 3: roughness
    lobes, cfg = lobes_for(buffers, 1)
    assert int(B.bsdf_num_lobes(lobes)[0]) == 2  # lambert + microfacet


def test_lambertian_furnace():
    """E[f * cos / pdf] over sample_f == albedo (white furnace)."""
    n = 20000
    albedo = (0.7, 0.2, 0.2)
    buffers = make_buffers(T.MAT_MATTE, tex_colors=(albedo,))
    lobes, cfg = lobes_for(buffers, n)
    onb, normal = default_frame(n)
    wo = V3.from_array(jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, 0.8]), (n, 3))).normalized()
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32))
    wi, f, pdf, state = B.bsdf_sample_f(lobes, onb, wo, state, cfg)
    weight = (f * (jnp.abs(wi.dot(normal)) / pdf)).to_array()
    est = np.asarray(jnp.mean(weight, axis=0))
    np.testing.assert_allclose(est, albedo, rtol=0.02)


def test_lambertian_pdf_integrates_to_one():
    """Integrate pdf over the sphere with uniform directions."""
    n = 400000
    buffers = make_buffers(T.MAT_MATTE)
    lobes, cfg = lobes_for(buffers, n)
    onb, normal = default_frame(n)
    wo = V3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.ones((n,)))
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 99)
    from rene_tpu.integrators.common import random_unit_vector
    wi, state = random_unit_vector(state)
    pdf = B.bsdf_pdf(lobes, onb, wo, wi, cfg)
    integral = float(jnp.mean(pdf) * 4.0 * np.pi)
    assert integral == pytest.approx(1.0, rel=0.02)


def test_microfacet_furnace_bounded():
    """Metal-like microfacet: reflected energy must be <= 1 (passivity)."""
    n = 20000
    buffers = make_buffers(
        T.MAT_METAL, u0=(0, 0, 1, 1), u1=(0, 0, 0, 0),
        tex_colors=((1.0, 1.0, 1.0), (0.2, 0.2, 0.2)))  # eta=k tex, rough=0.2
    lobes, cfg = lobes_for(buffers, n)
    onb, normal = default_frame(n)
    wo = V3.from_array(jnp.broadcast_to(
        jnp.asarray([0.4, 0.0, 0.9]), (n, 3))).normalized()
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 7)
    wi, f, pdf, _ = B.bsdf_sample_f(lobes, onb, wo, state, cfg)
    ok = pdf > 1e-6
    weight = v3.where(ok, f * (jnp.abs(wi.dot(normal))
                               / jnp.maximum(pdf, 1e-6)), 0.0).to_array()
    est = np.asarray(jnp.mean(weight, axis=0))
    assert np.all(est <= 1.05)
    # eta=1, k=1 conductor: F0 = ((eta-1)^2+k^2)/((eta+1)^2+k^2) = 0.2
    assert np.all(est > 0.15)


def test_fresnel_dielectric_normal_incidence():
    r = fr.fr_dielectric(jnp.asarray([1.0]), jnp.asarray([1.0]),
                         jnp.asarray([1.5]))
    expected = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
    assert float(r[0]) == pytest.approx(expected, rel=1e-5)


def test_fresnel_dielectric_tir():
    # from dense side beyond critical angle -> total internal reflection
    cos_i = -0.2  # exiting, grazing
    r = fr.fr_dielectric(jnp.asarray([cos_i]), jnp.asarray([1.0]),
                         jnp.asarray([1.5]))
    assert float(r[0]) == pytest.approx(1.0)


def test_ggx_d_projected_integral():
    """Integral of D(wh) cos(wh) over hemisphere ~= 1."""
    n = 400000
    ax = jnp.full((n,), 0.3)
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 13)
    u1, state = rng.next_f32(state)
    u2, state = rng.next_f32(state)
    # uniform hemisphere
    z = u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * np.pi * u2
    wh = V3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    d = mf.tr_d(ax, ax, wh) * z
    integral = float(jnp.mean(d) * 2.0 * np.pi)
    assert integral == pytest.approx(1.0, rel=0.05)


def test_glass_energy_conservation():
    """Fresnel-specular glass: reflected+transmitted weight == 1."""
    n = 20000
    buffers = make_buffers(T.MAT_GLASS, v0=(1.5, 0, 0, 0))
    lobes, cfg = lobes_for(buffers, n)
    onb, normal = default_frame(n)
    wo = V3.from_array(jnp.broadcast_to(
        jnp.asarray([0.3, 0.0, 0.95]), (n, 3))).normalized()
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 5)
    wi, f, pdf, _ = B.bsdf_sample_f(lobes, onb, wo, state, cfg)
    ok = pdf > 1e-6
    weight = v3.where(ok, f * (jnp.abs(wi.dot(normal))
                               / jnp.maximum(pdf, 1e-6)), 0.0).to_array()
    est = np.asarray(jnp.mean(weight, axis=0))
    np.testing.assert_allclose(est, [1.0, 1.0, 1.0], rtol=0.02)


def test_mirror_sample():
    buffers = make_buffers(T.MAT_MIRROR, tex_colors=((0.9, 0.9, 0.9),))
    lobes, cfg = lobes_for(buffers, 4)
    onb, normal = default_frame(4)
    wo = V3.from_array(jnp.broadcast_to(
        jnp.asarray([0.5, 0.0, 0.5]), (4, 3))).normalized()
    state = rng.pcg_init(jnp.arange(4, dtype=jnp.uint32))
    wi, f, pdf, _ = B.bsdf_sample_f(lobes, onb, wo, state, cfg)
    e = np.asarray([-0.5, 0.0, 0.5]) / np.linalg.norm([-0.5, 0.0, 0.5])
    np.testing.assert_allclose(np.asarray(wi.to_array()),
                               np.broadcast_to(e, (4, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)


def test_rng_matches_scalar_reference():
    """PCG32si vector impl vs a direct scalar transcription."""
    def scalar_pcg(seed):
        state = (seed * 747796405 + 2891336453) & 0xFFFFFFFF
        state = (state + seed) & 0xFFFFFFFF
        state = (state * 747796405 + 2891336453) & 0xFFFFFFFF
        outs = []
        for _ in range(4):
            old = state
            state = (state * 747796405 + 2891336453) & 0xFFFFFFFF
            word = ((old >> ((old >> 28) + 4)) ^ old) * 277803737 & 0xFFFFFFFF
            outs.append(((word >> 22) ^ word) & 0xFFFFFFFF)
        return outs

    seeds = [0, 1, 12345, 0xDEADBEEF]
    state = rng.pcg_init(jnp.asarray(seeds, jnp.uint32))
    got = []
    for _ in range(4):
        u, state = rng.next_u32(state)
        got.append(np.asarray(u))
    got = np.stack(got, axis=1)
    want = np.array([scalar_pcg(s) for s in seeds], dtype=np.uint64)
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_beckmann_d_integral_and_sampler_pdf(monkeypatch):
    """RENE_MF_DIST=beckmann: (1) D(wh) cos(wh) still integrates to 1;
    (2) the full-normal sampler matches its claimed pdf — importance
    and uniform MC estimates of an arbitrary smooth integrand agree."""
    monkeypatch.setenv("RENE_MF_DIST", "beckmann")
    n = 400000
    ax = jnp.full((n,), 0.3)
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 29)
    u1, state = rng.next_f32(state)
    u2, state = rng.next_f32(state)
    z = u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * np.pi * u2
    wh = V3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    d = mf.tr_d(ax, ax, wh) * z
    integral = float(jnp.mean(d) * 2.0 * np.pi)
    assert integral == pytest.approx(1.0, rel=0.05)

    # pdf normalization: int pdf dw == 1 (uniform-hemisphere MC)
    wo = V3.from_array(jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, 0.95]), (n, 3))).normalized()
    pdf_u = mf.tr_pdf(ax, ax, wo, wh)
    assert float(jnp.mean(pdf_u) * 2.0 * np.pi) == pytest.approx(
        1.0, rel=0.05)

    # sampler identity: tan^2(theta_h) | phi ~ Exp(1/ax^2) for the
    # isotropic full-normal sampler, so E[tan^2] == ax^2
    u3, state = rng.next_f32(state)
    u4, state = rng.next_f32(state)
    whs = mf.tr_sample_wh(ax, ax, wo, u3, u4)
    tan2 = (1.0 - whs.z * whs.z) / jnp.maximum(whs.z * whs.z, 1e-12)
    assert float(jnp.mean(tan2)) == pytest.approx(0.09, rel=0.05)
