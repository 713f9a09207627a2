"""Distant-light table: scenes past MAX_LIGHTS=16 fold their lights
from a VMEM row table instead of falling 250x to the XLA engine
(VERDICT r4 missing #2; the reference keeps lights in a storage buffer
with no cap, rene/src/main.rs:2965-3299)."""
import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene
from rene_tpu.scene.device import build_device_scene
from rene_tpu.integrators.pallas_path import (
    MAX_LIGHTS, make_pallas_batch_fn, pack_scene, pallas_eligible)


def _many_light_scene(n=24):
    rng = np.random.default_rng(5)
    parts = ["""
LookAt 0 -6 2  0 0 1  0 0 1
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [20] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
AttributeBegin
  Material "matte" "rgb Kd" [.5 .5 .48]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-8 -8 0  -8 8 0  8 8 0  8 -8 0]
AttributeEnd
AttributeBegin
  Material "plastic" "rgb Kd" [.4 .3 .5] "rgb Ks" [.3 .3 .3]
    "float roughness" [0.08] "bool remaproughness" ["false"]
  Translate 0 0 1.1
  Shape "sphere" "float radius" 1.1
AttributeEnd
"""]
    for i in range(n):
        th = 2 * np.pi * i / n
        el = 0.4 + 0.5 * rng.random()
        fx = 6 * np.cos(th)
        fy = 6 * np.sin(th)
        fz = 6 * np.tan(el)
        c = 0.12 + 0.1 * rng.random(3)
        parts.append(
            f'LightSource "distant" "rgb L" [{c[0]:.3f} {c[1]:.3f} '
            f'{c[2]:.3f}] "point from" [{fx:.3f} {fy:.3f} {fz:.3f}] '
            f'"point to" [0 0 0]\n')
    parts.append("WorldEnd\n")
    return create_scene(parse_pbrt("".join(parts)), ".")


@pytest.mark.slow
@pytest.mark.parametrize("n", [24, 64])
def test_many_lights_eligible_and_matches(n):
    scene = _many_light_scene(n)
    bn, config = build_device_scene(scene)
    assert config.num_lights == n > MAX_LIGHTS
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    assert ps.light_table is not None
    assert ps.light_table.shape[0] >= n
    np.testing.assert_allclose(
        np.linalg.norm(ps.light_table[:n, 0:3], axis=1), 1.0, rtol=1e-5)

    run = make_pallas_batch_fn(bn, config, interpret=True)
    assert run is not None
    spp = 8
    out = run(3, spp)
    img = np.asarray(out["radiance"])
    assert np.isfinite(img).all()
    pallas_mean = img.mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=16, seed=2, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_light_table_smoke():
    """Fast-lane smoke: >16 lights pack a row table and render finite
    non-black output (XLA parity slow-marked above; lowering covered by
    test_mosaic_lowering.test_megakernel_light_table_lowers_for_tpu)."""
    scene = _many_light_scene(20)
    scene.max_depth_hint = 2
    bn, config = build_device_scene(scene)
    ps = pack_scene(bn, config)
    assert ps.light_table is not None
    run = make_pallas_batch_fn(bn, config, interpret=True)
    out = run(3, 2)
    img = np.asarray(out["radiance"])
    assert np.isfinite(img).all() and img.mean() > 0.01
