"""Sphere-table march: scenes past MAX_SPHERES stay on the megakernel
(VERDICT r4 missing #2 — the reference's shared unit-sphere BLAS serves
any sphere count, main.rs:2437-2590; we previously fell 250x to XLA)."""
import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene
from rene_tpu.scene.device import build_device_scene
from rene_tpu.integrators.pallas_path import (
    MAX_SPHERES, make_pallas_batch_fn, pack_scene, pallas_eligible)


def _many_sphere_scene(n=150, emissive=True, fov=55):
    rng = np.random.default_rng(11)
    parts = ["""
LookAt 0 -14 6  0 0 1  0 0 1
Camera "perspective" "float fov" [%d]
Film "image" "integer xresolution" [24] "integer yresolution" [18]
Integrator "path" "integer maxdepth" 5
WorldBegin
LightSource "distant" "rgb L" [2.2 2.0 1.8] "point from" [3 -4 8]
  "point to" [0 0 0]
LightSource "infinite" "rgb L" [.25 .28 .33]
AttributeBegin
  Material "matte" "rgb Kd" [.55 .5 .45]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-12 -12 0  -12 12 0  12 12 0  12 -12 0]
AttributeEnd
""" % fov]
    mats = ['Material "matte" "rgb Kd" [.7 .3 .25]',
            'Material "matte" "rgb Kd" [.25 .6 .3]',
            'Material "plastic" "rgb Kd" [.3 .3 .65] "rgb Ks" [.2 .2 .2]'
            ' "float roughness" [0.1] "bool remaproughness" ["false"]']
    side = int(np.ceil(np.sqrt(n)))
    for i in range(n):
        gx, gy = i % side, i // side
        x = (gx - side / 2) * 1.4 + rng.uniform(-0.2, 0.2)
        y = (gy - side / 2) * 1.4 + rng.uniform(-0.2, 0.2)
        r = rng.uniform(0.25, 0.55)
        parts.append(f"""
AttributeBegin
  {mats[i % 3]}
  Translate {x:.3f} {y:.3f} {r:.3f}
  Shape "sphere" "float radius" {r:.3f}
AttributeEnd""")
    if emissive:
        parts.append("""
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 8 6]
  Material "matte" "rgb Kd" [0 0 0]
  Translate 0 0 6
  Shape "sphere" "float radius" 0.8
AttributeEnd""")
    parts.append("\nWorldEnd\n")
    return create_scene(parse_pbrt("".join(parts)), ".")


def test_many_spheres_eligible_and_packed():
    scene = _many_sphere_scene(150)
    bn, config = build_device_scene(scene)
    assert config.num_spheres > MAX_SPHERES
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    assert ps.n_sph_blocks >= 2
    assert ps.sph_table.shape[1] == ps.n_sph_blocks * 128
    # emissive sphere stays an immediate; the 150 matte/plastic go to
    # the table with one material slot per distinct record
    assert len(ps.spheres) == 1
    assert 2 <= len(ps.sph_mats) <= 3
    # padding slots can never hit (r = -1)
    n_real = 150
    assert np.all(ps.sph_table[3, n_real:] <= 0.0)


@pytest.mark.slow
def test_many_spheres_interpret_matches_xla():
    # interpret mode pays BOTH branches of every block cond, so keep
    # the scene at one table block (100 spheres) and few samples; the
    # image-mean comparison averages 432 pixels, which bounds the
    # estimator noise well under the 10% tolerance
    scene = _many_sphere_scene(100)
    scene.max_depth_hint = 4
    bn, config = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    assert run is not None
    spp = 4
    out = run(7, spp)
    img = np.asarray(out["radiance"])
    assert np.isfinite(img).all()
    pallas_mean = img.mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=8, seed=3, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


@pytest.mark.slow
def test_thousand_spheres_interpret_matches_xla():
    scene = _many_sphere_scene(1000, fov=70)
    scene.max_depth_hint = 3
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 2
    out = run(9, spp)
    img = np.asarray(out["radiance"])
    assert np.isfinite(img).all()
    pallas_mean = img.mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=6, seed=5, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_sphere_table_smoke():
    """Fast-lane smoke: the table march renders finite non-black output
    (full XLA parity is the slow-marked test above; Mosaic lowering is
    test_mosaic_lowering.test_megakernel_sphere_table_lowers_for_tpu)."""
    scene = _many_sphere_scene(80, emissive=False)
    scene.max_depth_hint = 2
    bn, config = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    out = run(3, 2)
    img = np.asarray(out["radiance"])
    assert np.isfinite(img).all() and img.mean() > 0.01
