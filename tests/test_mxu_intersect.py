"""MXU Plücker intersector vs Möller–Trumbore ground truth."""
import jax.numpy as jnp
import numpy as np
import pytest

from rene_tpu.ops import intersect as I
from rene_tpu.ops.mxu_intersect import MXUIntersector
from tests.test_intersect import random_rays, random_tris


@pytest.mark.parametrize("ntri", [8, 36, 500])
def test_matches_moller_trumbore(ntri):
    tri = random_tris(ntri, seed=ntri + 40, scale=3.0)
    org, d = random_rays(800, seed=ntri + 41, scale=4.0)
    tmin = jnp.full((800,), 1e-3)
    tmax = jnp.full((800,), 1e30)
    bt, bid = I.intersect_triangles(org, d, tmin, tmax, jnp.asarray(tri))
    mx = MXUIntersector(tri)
    mt, mid, u, v = mx.intersect(org, d, tmin, tmax, want_bary=True)
    bt = np.asarray(bt)
    mt = np.asarray(mt)
    hit_b = bt < 1e29
    hit_m = mt < 1e29
    # identical hit sets up to f32 edge cases
    assert (hit_b == hit_m).mean() > 0.998
    both = hit_b & hit_m
    assert both.sum() > 10  # the test must actually exercise hits
    np.testing.assert_allclose(mt[both], bt[both], rtol=2e-3, atol=1e-4)
    assert (np.asarray(bid)[both] == np.asarray(mid)[both]).mean() > 0.99


def test_barycentrics_match_mt_convention():
    # one triangle; compare (u, v) against the MT attribute convention
    tri = np.asarray([[[0.0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
    pts = [(0.3, 0.4), (0.1, 0.05), (0.6, 0.3)]
    org = np.asarray([[2 * u_ + 0 * v_, 2 * v_, 1.0] for u_, v_ in pts],
                     np.float32)
    # ray straight down hits at (x, y, 0); bary u = x/2, v = y/2
    d = np.broadcast_to(np.asarray([0, 0, -1.0], np.float32), (3, 3)).copy()
    mx = MXUIntersector(tri)
    t, tid, u, v = mx.intersect(jnp.asarray(org), jnp.asarray(d),
                                jnp.full((3,), 1e-3), jnp.full((3,), 1e3),
                                want_bary=True)
    for i, (ue, ve) in enumerate(pts):
        assert float(t[i]) == pytest.approx(1.0, rel=1e-4)
        assert float(u[i]) == pytest.approx(ue, abs=1e-4)
        assert float(v[i]) == pytest.approx(ve, abs=1e-4)


def test_backface_hits():
    tri = np.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    mx = MXUIntersector(tri)
    org = jnp.asarray([[0.2, 0.2, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, _ = mx.intersect(org, d, jnp.asarray([1e-3]), jnp.asarray([1e3]))
    assert float(t[0]) == pytest.approx(1.0, rel=1e-4)
