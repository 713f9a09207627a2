"""Intersection tests: Möller–Trumbore, spheres, BVH vs brute-force."""
import jax.numpy as jnp
import numpy as np
import pytest

from rene_tpu.ops import intersect as I
from rene_tpu.ops.bvh import build_bvh


def random_tris(n, seed=0, scale=10.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-scale, scale, (n, 1, 3))
    tri = base + r.uniform(-1.0, 1.0, (n, 3, 3))
    return tri.astype(np.float32)


def random_rays(n, seed=1, scale=12.0):
    r = np.random.default_rng(seed)
    org = r.uniform(-scale, scale, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_single_triangle_hit():
    tri = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    org = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, tid = I.intersect_triangles(org, d, jnp.asarray([0.001]),
                                   jnp.asarray([100.0]), tri)
    assert float(t[0]) == pytest.approx(1.0, rel=1e-5)
    assert int(tid[0]) == 0


def test_triangle_backface_hits():
    # no backface culling (FORCE_OPAQUE, no cull flags in the reference)
    tri = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    org = jnp.asarray([[0.25, 0.25, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, _ = I.intersect_triangles(org, d, jnp.asarray([0.001]),
                                 jnp.asarray([100.0]), tri)
    assert float(t[0]) == pytest.approx(1.0, rel=1e-5)


def test_sphere_roots():
    import dataclasses

    from rene_tpu.ops.vec3 import V3

    @dataclasses.dataclass
    class Cfg:
        num_spheres: int = 1

    # unit sphere at origin; ray from +3z towards origin
    buffers = {"sph_w2o": jnp.eye(3, 4)[None]}
    org = V3.from_array(jnp.asarray([[0.0, 0, 3.0]]))
    d = V3.from_array(jnp.asarray([[0.0, 0, -1.0]]))
    t, sid = I.intersect_spheres_v3(buffers, Cfg(), org, d,
                                    jnp.asarray([0.001]),
                                    jnp.asarray([100.0]))
    assert float(t[0]) == pytest.approx(2.0, rel=1e-5)
    # from inside: far root
    org2 = V3.from_array(jnp.asarray([[0.0, 0, 0.0]]))
    t2, _ = I.intersect_spheres_v3(buffers, Cfg(), org2, d,
                                   jnp.asarray([0.001]),
                                   jnp.asarray([100.0]))
    assert float(t2[0]) == pytest.approx(1.0, rel=1e-5)


@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("ntri", [10, 333, 2000])
def test_bvh_matches_brute_force(ntri, native):
    tri = random_tris(ntri, seed=ntri)
    org, d = random_rays(512, seed=ntri + 1)
    tmin = jnp.full((512,), 1e-3)
    tmax = jnp.full((512,), 1e30)
    bt, bid = I.intersect_triangles(org, d, tmin, tmax, jnp.asarray(tri))
    bvh = build_bvh(tri, use_native=native)
    vt, vid = bvh.intersect(org, d, tmin, tmax)
    bt = np.asarray(bt)
    vt = np.asarray(vt)
    hit_b = bt < 1e29
    hit_v = np.asarray(vt) < 1e29
    np.testing.assert_array_equal(hit_b, hit_v)
    np.testing.assert_allclose(vt[hit_b], bt[hit_b], rtol=1e-4, atol=1e-5)
    # primitive ids must agree wherever the hit is unambiguous
    same = np.asarray(bid) == np.asarray(vid)
    assert same[hit_b].mean() > 0.99


def test_bvh_respects_tmax():
    tri = random_tris(100, seed=7)
    org, d = random_rays(256, seed=8)
    tmin = jnp.full((256,), 1e-3)
    bt, _ = I.intersect_triangles(org, d, tmin, jnp.full((256,), 1e30),
                                  jnp.asarray(tri))
    bvh = build_bvh(tri)
    # cap tmax below some hits: capped rays must miss
    cap = jnp.asarray(np.where(np.asarray(bt) < 1e29,
                               np.asarray(bt) * 0.5, 1e30).astype(np.float32))
    vt, _ = bvh.intersect(org, d, tmin, cap)
    assert bool(jnp.all(vt >= 1e29))
