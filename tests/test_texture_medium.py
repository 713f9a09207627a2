"""Texture dispatch and participating-media unit tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rene_tpu.ops import vec3 as v3
from rene_tpu.ops.vec3 import V3
from rene_tpu.ops import medium as MD
from rene_tpu.ops import rng
from rene_tpu.ops.texture import sample_image, tex_color
from rene_tpu.scene import types as T


def make_tex_buffers():
    """Texture table: 0 solid red, 1 solid white, 2 checker(0,1, 2x2),
    3 imagemap, 4 scale(0,1)."""
    img = np.zeros((2, 2, 4), np.float32)
    img[0, 0] = [1, 0, 0, 1]
    img[0, 1] = [0, 1, 0, 1]
    img[1, 0] = [0, 0, 1, 1]
    img[1, 1] = [1, 1, 1, 1]
    return {
        "tex_type": jnp.asarray([T.TEX_SOLID, T.TEX_SOLID, T.TEX_CHECKER,
                                 T.TEX_IMAGEMAP, T.TEX_SCALE], jnp.int32),
        "tex_u0": jnp.asarray([[0] * 4, [0] * 4, [0, 1, 0, 0],
                               [0, 0, 0, 0], [0, 1, 0, 0]], jnp.int32),
        "tex_v0": jnp.asarray([[1, 0, 0, 0], [1, 1, 1, 0],
                               [2, 2, 0, 0], [0] * 4, [0] * 4], jnp.float32),
        "img_atlasT": jnp.asarray(img.reshape(-1, 4).T),
        "img_offset": jnp.zeros((1,), jnp.int32),
        "img_width": jnp.full((1,), 2, jnp.int32),
        "img_height": jnp.full((1,), 2, jnp.int32),
        "tex_v0T": jnp.asarray([[1, 0, 0, 0], [1, 1, 1, 0], [2, 2, 0, 0],
                                [0] * 4, [0] * 4], jnp.float32).T,
    }


def test_solid():
    b = make_tex_buffers()
    c = tex_color(b, jnp.asarray([0, 1]), jnp.zeros((2, 2))).to_array()
    np.testing.assert_allclose(np.asarray(c), [[1, 0, 0], [1, 1, 1]])


def test_checkerboard_parity():
    b = make_tex_buffers()
    # uscale=vscale=2: cell (0,0) -> tex1 (red), cell (1,0) -> tex2 (white)
    uv = jnp.asarray([[0.1, 0.1], [0.6, 0.1], [0.6, 0.6], [0.1, 0.6]])
    c = tex_color(b, jnp.full((4,), 2, jnp.int32), uv).to_array()
    np.testing.assert_allclose(np.asarray(c),
                               [[1, 0, 0], [1, 1, 1], [1, 0, 0], [1, 1, 1]])


def test_imagemap_corners():
    b = make_tex_buffers()
    # v flip: uv (0.25, 0.75) samples texel row 0 (top), col 0 -> red
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.75], [0.25, 0.25]])
    c = tex_color(b, jnp.full((3,), 3, jnp.int32), uv).to_array()
    np.testing.assert_allclose(np.asarray(c),
                               [[1, 0, 0], [0, 1, 0], [0, 0, 1]], atol=1e-6)


def test_scale_product():
    b = make_tex_buffers()
    c = tex_color(b, jnp.asarray([4]), jnp.zeros((1, 2))).to_array()
    np.testing.assert_allclose(np.asarray(c), [[1, 0, 0]])  # red * white


def make_medium_buffers(sigma_a, sigma_s, g):
    return {
        "med_type": jnp.asarray([T.MEDIUM_VACUUM, T.MEDIUM_HOMOGENEOUS],
                                jnp.int32),
        "med_sigma_a": jnp.asarray([[0, 0, 0], sigma_a], jnp.float32),
        "med_sigma_s": jnp.asarray([[0, 0, 0], sigma_s], jnp.float32),
        "med_g": jnp.asarray([0.0, g], jnp.float32),
    }


def test_medium_tr_beer_lambert():
    b = make_medium_buffers([0.5, 1.0, 2.0], [0, 0, 0], 0.0)
    d = V3.from_array(jnp.asarray([[1.0, 0, 0]]))
    tr = MD.med_tr(b, jnp.asarray([1]), d, jnp.asarray([2.0])).to_array()
    np.testing.assert_allclose(np.asarray(tr[0]),
                               np.exp(-np.array([0.5, 1, 2]) * 2), rtol=1e-5)
    # vacuum -> 1
    tr0 = MD.med_tr(b, jnp.asarray([0]), d, jnp.asarray([2.0])).to_array()
    np.testing.assert_allclose(np.asarray(tr0[0]), [1, 1, 1])


def test_medium_sampling_unbiased_transmittance():
    """E[weight * indicator(pass-through)] reproduces Beer-Lambert."""
    n = 200000
    sigma = [0.3, 0.3, 0.3]
    b = make_medium_buffers([0.1, 0.1, 0.1], [0.2, 0.2, 0.2], 0.0)
    org = V3.zeros((n,))
    d = V3(jnp.ones((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
    t_max = jnp.full((n,), 3.0)
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32))
    sampled, pos, w, state = MD.med_sample(b, jnp.ones((n,), jnp.int32),
                                           org, d, t_max, state)
    # surviving (not sampled) lanes weight-average to Tr(t_max)
    est = np.asarray(jnp.mean(v3.where(sampled, 0.0, w).to_array(), axis=0))
    np.testing.assert_allclose(est, np.exp(-0.3 * 3.0) * np.ones(3),
                               rtol=0.02)


def test_hg_phase_normalization():
    """Integral of HG phase over the sphere == 1."""
    n = 400000
    b = make_medium_buffers([0, 0, 0], [1, 1, 1], 0.4)
    from rene_tpu.integrators.common import random_unit_vector
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 3)
    wi, state = random_unit_vector(state)
    wo = V3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.ones((n,)))
    p = MD.med_phase(b, jnp.ones((n,), jnp.int32), wo, wi)
    integral = float(jnp.mean(p) * 4 * np.pi)
    assert integral == pytest.approx(1.0, rel=0.02)


def test_hg_sampler_matches_phase():
    """Mean cosine of HG samples == -g (pbrt convention: wo points back
    along the incoming ray, so forward scattering has wi ~ -wo)."""
    n = 200000
    g = 0.6
    b = make_medium_buffers([0, 0, 0], [1, 1, 1], g)
    state = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32) + 9)
    wo = V3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.ones((n,)))
    d, state = MD.med_sample_p(b, jnp.ones((n,), jnp.int32), wo, state)
    mean_cos = float(jnp.mean(d.dot(wo)))
    assert mean_cos == pytest.approx(-g, abs=0.01)
    # unit directions
    assert float(jnp.abs(d.length() - 1.0).max()) < 1e-4
