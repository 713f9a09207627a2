"""Pallas megakernel tests (interpret mode on CPU) vs the XLA integrator."""
import numpy as np
import pytest

from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene, load_scene
from rene_tpu.scene.device import build_device_scene
from rene_tpu.integrators.pallas_path import (make_pallas_batch_fn,
                                              pallas_eligible, pack_scene)


def test_eligibility(sample_scenes):
    cornell = load_scene(str(sample_scenes / "cornell-box/scene.pbrt"))
    bn, config = build_device_scene(cornell)
    assert pallas_eligible(bn, config)

    veach = load_scene(str(sample_scenes / "veach-mis/scene.pbrt"))
    bn, config = build_device_scene(veach)
    assert pallas_eligible(bn, config)

    # teapot: 126k tris (cluster table) + substrate + checker floor
    teapot = load_scene(str(sample_scenes / "teapot/scene.pbrt"))
    bn, config = build_device_scene(teapot)
    assert pallas_eligible(bn, config)


def _write_pfm(path, arr):
    """arr: (h, w, 3) float32; PFM stores rows bottom-up, LE."""
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"PF\n{w} {h}\n-1.0\n".encode())
        f.write(arr[::-1].astype("<f4").tobytes())


def _env_scene(tmp_path):
    env = np.zeros((4, 8, 3), np.float32)
    env[..., 0] = np.linspace(0.1, 1.0, 8)[None, :]
    env[..., 1] = np.linspace(1.0, 0.2, 4)[:, None]
    env[..., 2] = 0.3
    _write_pfm(tmp_path / "env.pfm", env)
    src = """
LookAt 0 -5 0  0 0 0  0 0 1
Camera "perspective" "float fov" 60
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [1 .9 .8] "string mapname" "env.pfm"
Material "matte" "rgb Kd" [.5 .4 .3]
Shape "sphere" "float radius" 1
WorldEnd"""
    return create_scene(parse_pbrt(src), str(tmp_path))


def test_imagemap_background_eligible_and_matches(tmp_path):
    """An env-mapped infinite light is pallas-eligible and the kernel's
    paged VMEM fetch statistically matches the XLA miss shader
    (regression for the round-1 silent-wrong-render hole)."""
    scene = _env_scene(tmp_path)
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    assert ps.bg_img is not None and ps.img_table is not None
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 16
    out = run(5, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=2, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_imagemap_kd_matches(tmp_path):
    """matte Kd imagemap (paged fetch at hit uv) matches XLA."""
    tex = np.zeros((8, 16, 3), np.float32)
    tex[..., 0] = np.linspace(0.05, 0.9, 16)[None, :]
    tex[..., 1] = np.linspace(0.9, 0.1, 8)[:, None]
    tex[..., 2] = 0.5
    _write_pfm(tmp_path / "kd.pfm", tex)
    src = """
LookAt 0 -4 0  0 0 0  0 0 1
Camera "perspective" "float fov" 50
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [.9 .9 .9]
Texture "kdmap" "spectrum" "imagemap" "string filename" "kd.pfm"
Material "matte" "texture Kd" "kdmap"
Shape "sphere" "float radius" 1
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-3 1.5 -3  -3 1.5 3  3 1.5 3  3 1.5 -3]
  "float uv" [0 0  0 1  1 1  1 0]
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 16
    out = run(9, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=6, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)
    # albedo AOV carries the fetched texture too
    alb = np.asarray(out["albedo"]).reshape(16, 16, 3) / spp
    assert alb[8, 8].max() > 0.05


def test_checker_imagemap_sub_not_eligible(tmp_path):
    """Checker with an imagemap sub-texture stays on the XLA path."""
    _write_pfm(tmp_path / "kd.pfm", np.ones((4, 4, 3), np.float32))
    src = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Texture "kdmap" "spectrum" "imagemap" "string filename" "kd.pfm"
Texture "check" "spectrum" "checkerboard" "texture tex1" "kdmap"
  "rgb tex2" [.7 .7 .7]
Material "matte" "texture Kd" "check"
Shape "sphere" "float radius" 1
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, config = build_device_scene(scene)
    assert not pallas_eligible(bn, config)


def test_solid_background_texture_folded():
    """A constant-color background folds texture * background_color into
    the baked kernel constant."""
    src = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
LightSource "infinite" "rgb L" [.5 .25 .125]
WorldEnd"""
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    np.testing.assert_allclose(ps.background, [0.5, 0.25, 0.125])


def test_pack_scene_records(sample_scenes):
    scene = load_scene(str(sample_scenes / "cornell-box/scene.pbrt"))
    bn, config = build_device_scene(scene)
    ps = pack_scene(bn, config)
    # parallelogram fusion folds flat non-emissive tri pairs into quads
    assert len(ps.tris) + 2 * len(ps.quads) == config.num_triangles
    assert ps.quads, "cornell walls/boxes should fuse into quads"
    emissive = [t for t in ps.tris if t["emissive"]]
    assert len(emissive) == 2
    np.testing.assert_allclose(emissive[0]["emit"], [17, 12, 4])
    assert ps.num_emit == 1
    assert ps.max_depth == 65  # honors the scene's maxdepth


@pytest.mark.slow
def test_matches_xla_integrator(sample_scenes):
    """Interpret-mode pallas render statistically matches the XLA path."""
    scene = load_scene(str(sample_scenes / "cornell-box/scene.pbrt"))
    scene.film.xresolution = 32
    scene.film.yresolution = 32
    scene.max_depth_hint = 6
    bn, config = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 24
    out = run(3, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=64, seed=5, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.12)
    # AOVs too (mean |component| is flip/cancellation-invariant)
    n_mean = np.abs(np.asarray(out["normal"]) / spp).mean(axis=0)
    xn_mean = np.abs(xla["normal"]).mean(axis=(0, 1))
    assert np.abs(n_mean - xn_mean).max() < 0.1


FOG_SCENE = """
LookAt 0 -5 0  0 0 0  0 0 1
Camera "perspective" "float fov" 45
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "volpath" "integer maxdepth" 6
WorldBegin
LightSource "infinite" "rgb L" [.6 .6 .6]
LightSource "distant" "rgb L" [2 2 2] "point from" [0 -1 1] "point to" [0 0 0]
AttributeBegin
  MakeNamedMedium "fog" "rgb sigma_a" [.2 .25 .3] "rgb sigma_s" [.8 .7 .6]
    "float g" 0.2
  MediumInterface "fog" ""
  Shape "sphere" "float radius" 1.5
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [6 4 2]
  Material "matte" "rgb Kd" [0 0 0]
  Translate 0 0 2.5
  Shape "sphere" "float radius" 0.4
AttributeEnd
AttributeBegin
  Material "matte" "rgb Kd" [.6 .5 .4]
  Translate 0 2.5 0
  Shape "sphere" "float radius" 1
AttributeEnd
WorldEnd
"""


def test_volpath_eligible_and_packs():
    scene = create_scene(parse_pbrt(FOG_SCENE), "/tmp")
    bn, config = build_device_scene(scene)
    assert config.integrator == "volpath"
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    assert ps.integrator == "volpath"
    assert len(ps.media) == 2 and not ps.media[1]["vacuum"]
    np.testing.assert_allclose(ps.media[1]["sigma_s"], [.8, .7, .6])
    # fog sphere records carry the interior medium index
    assert any(s["imed"] == 1 for s in ps.spheres)


@pytest.mark.slow
def test_volpath_matches_xla_integrator():
    """Interpret-mode pallas volpath statistically matches the XLA
    volpath integrator (medium sampling, tr marching, interface
    tracking)."""
    scene = create_scene(parse_pbrt(FOG_SCENE), "/tmp")
    bn, config = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    assert run is not None
    spp = 32
    out = run(7, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=48, seed=3, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


UBER_SCENE = """
LookAt 0 -6 1  0 0 1  0 0 1
Camera "perspective" "float fov" 50
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Integrator "path" "integer maxdepth" 5
WorldBegin
LightSource "infinite" "rgb L" [.7 .7 .7]
LightSource "distant" "rgb L" [1.5 1.4 1.2] "point from" [1 -2 4]
  "point to" [0 0 0]
AttributeBegin
  Material "plastic" "rgb Kd" [.4 .2 .1] "rgb Ks" [.3 .3 .3]
    "float roughness" .2
  Translate -1.5 0 1
  Shape "sphere" "float radius" 1
AttributeEnd
AttributeBegin
  Material "uber" "rgb Kd" [.2 .3 .4] "rgb Ks" [.2 .2 .2]
    "rgb Kr" [.1 .1 .1] "rgb opacity" [.8 .8 .8] "float eta" 1.5
    "float roughness" .15
  Translate 1.5 0 1
  Shape "sphere" "float radius" 1
AttributeEnd
AttributeBegin
  Texture "check" "spectrum" "checkerboard" "rgb tex1" [.1 .1 .1]
    "rgb tex2" [.7 .7 .7] "float uscale" 8 "float vscale" 8
  Material "matte" "texture Kd" "check"
  Translate 0 3 1
  Shape "sphere" "float radius" 1.2
AttributeEnd
WorldEnd
"""


def test_uber_plastic_checker_sphere_eligible():
    scene = create_scene(parse_pbrt(UBER_SCENE), "/tmp")
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    uber = [s for s in ps.spheres if s["mat_type"] == 6]
    assert uber and np.allclose(uber[0]["op"], [0.2, 0.2, 0.2])
    assert np.allclose(uber[0]["kr2"], [0.08, 0.08, 0.08])
    checker = [s for s in ps.spheres if s["tex"][0] == "checker"]
    assert checker and checker[0]["tex"][1] == 8.0


@pytest.mark.slow
def test_uber_plastic_matches_xla_integrator():
    """Interpret-mode parity for the multi-lobe materials (uber with
    opacity/Kr lobes, plastic) and spherical-uv checker spheres."""
    scene = create_scene(parse_pbrt(UBER_SCENE), "/tmp")
    bn, config = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    assert run is not None
    spp = 48
    out = run(11, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=64, seed=4, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_sphere_scene_pallas(sample_scenes):
    """Background + matte sphere through the megakernel."""
    scene = load_scene(str(sample_scenes / "sphere.pbrt"))
    scene.film.xresolution = 32
    scene.film.yresolution = 24
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 4
    out = run(1, spp)
    img = np.asarray(out["radiance"]).reshape(24, 32, 3) / spp
    # corner = background color
    np.testing.assert_allclose(img[0, 0], [0.4, 0.45, 0.5], atol=0.02)
    # center = red-ish sphere
    c = img[12, 16]
    assert c[0] > c[1] and c[0] > c[2]


def test_substrate_plastic_kd_imagemap_matches(tmp_path):
    """Imagemap Kd on substrate and plastic (the diffuse slot feeding the
    shared albedo attributes) is pallas-eligible and matches XLA."""
    tex = np.zeros((8, 16, 3), np.float32)
    tex[..., 0] = np.linspace(0.1, 0.8, 16)[None, :]
    tex[..., 1] = 0.4
    tex[..., 2] = np.linspace(0.7, 0.1, 8)[:, None]
    _write_pfm(tmp_path / "kd.pfm", tex)
    src = """
LookAt 0 -4 1.2  0 0 0.6  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [.8 .8 .8]
Texture "kdmap" "spectrum" "imagemap" "string filename" "kd.pfm"
Material "substrate" "texture Kd" "kdmap" "rgb Ks" [.15 .15 .15]
  "float uroughness" [0.1] "float vroughness" [0.1]
  "bool remaproughness" ["false"]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-2 1 -2  -2 1 2  2 1 2  2 1 -2]
  "float uv" [0 0  0 1  1 1  1 0]
Material "plastic" "texture Kd" "kdmap" "rgb Ks" [.2 .2 .2]
  "float roughness" [0.2] "bool remaproughness" ["false"]
Shape "sphere" "float radius" 0.8
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 16
    out = run(11, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=8, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = xla["albedo"].mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


@pytest.mark.slow
def test_many_spheres_and_lights_eligible_and_match():
    """Raised eligibility limits (MAX_SPHERES=64, MAX_LIGHTS=16): a scene
    with 12 spheres and 6 distant lights runs in the kernel and matches
    the XLA integrator (the limits were 8/4 in round 2 — both are baked
    immediates, so this is pure unroll bookkeeping)."""
    spheres = "\n".join(
        f'AttributeBegin\n  Material "matte" "rgb Kd" '
        f'[{0.2 + 0.05 * i:.2f} {0.7 - 0.04 * i:.2f} 0.4]\n'
        f'  Translate {(i % 4) * 1.6 - 2.4:.1f} {(i // 4) * 1.6 - 1.6:.1f} 0\n'
        f'  Shape "sphere" "float radius" 0.55\nAttributeEnd'
        for i in range(12))
    lights = "\n".join(
        f'LightSource "distant" "rgb L" [{0.3 + 0.1 * i:.1f} 0.3 0.2] '
        f'"point from" [{i - 2.5:.1f} -3 2] "point to" [0 0 0]'
        for i in range(6))
    src = f"""
LookAt 0 -8 3  0 0 0  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [.3 .3 .35]
{lights}
{spheres}
WorldEnd"""
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, config = build_device_scene(scene)
    assert config.num_spheres == 12 and config.num_lights == 6
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 12
    out = run(4, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=9, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_rotated_scaled_emitter_sphere_sampling_consistent():
    """Rotated + anisotropically scaled sphere emitter: the cone
    sampler/pdf pair derives the radius from the o2w COLUMN NORMS (the
    round-2 diagonal average diverges under rotation), and shading
    points inside the mean-radius bounding sphere fall back to a
    uniform-sphere sample with a matching 1/(4pi) pdf. Pallas and XLA
    implement the same pair and must agree."""
    src = """
LookAt 0 -6 2.5  0 0 0.5  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [.1 .1 .12]
Material "matte" "rgb Kd" [.6 .55 .5]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-4 -4 0  -4 4 0  4 4 0  4 -4 0]
AttributeBegin
  Material "matte" "rgb Kd" [.5 .3 .2]
  Translate 0.9 0 1.2
  Shape "sphere" "float radius" 0.35
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [5 4 3]
  Material "matte" "rgb Kd" [0 0 0]
  Translate 0 0 1.2
  Rotate 35 0 0 1
  Scale 2.4 0.25 0.6
  Shape "sphere" "float radius" 1
AttributeEnd
WorldEnd"""
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 32
    out = run(13, spp)
    mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    assert np.isfinite(mean).all() and mean.min() > 0
    from rene_tpu.render import render
    xla = render(scene, spp=48, seed=5, engine="xla")
    np.testing.assert_allclose(mean, xla["color"].mean(axis=(0, 1)),
                               rtol=0.12)


@pytest.mark.slow
def test_textured_roughness_and_ks_eligible_and_match(tmp_path):
    """ANY-SLOT kernel textures (round-3): imagemap roughness (with
    remap) on substrate and checker Ks on plastic keep the scene at
    megakernel rate and match the XLA integrator (the round-2 kernel
    demoted any non-Kd textured slot to the XLA path)."""
    rough = np.zeros((8, 8, 3), np.float32)
    rough[..., 0] = np.linspace(0.02, 0.6, 8)[None, :]
    rough[..., 1] = rough[..., 0]
    rough[..., 2] = rough[..., 0]
    _write_pfm(tmp_path / "rough.pfm", rough)
    src = """
LookAt 0 -4 1.2  0 0 0.6  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [.8 .8 .8]
LightSource "distant" "rgb L" [2 1.8 1.5] "point from" [1 -2 4]
  "point to" [0 0 0]
Texture "rmap" "float" "imagemap" "string filename" "rough.pfm"
Texture "kscheck" "spectrum" "checkerboard" "float uscale" 4
  "float vscale" 4 "rgb tex1" [.05 .05 .05] "rgb tex2" [.4 .4 .4]
Material "substrate" "rgb Kd" [.3 .25 .2] "rgb Ks" [.2 .2 .2]
  "texture uroughness" "rmap" "texture vroughness" "rmap"
  "bool remaproughness" ["true"]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-2 1 -2  -2 1 2  2 1 2  2 1 -2]
  "float uv" [0 0  0 1  1 1  1 0]
Material "plastic" "rgb Kd" [.4 .2 .15] "texture Ks" "kscheck"
  "float roughness" [0.15] "bool remaproughness" ["false"]
Shape "sphere" "float radius" 0.8
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config), \
        "textured roughness/Ks must stay kernel-eligible"
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 16
    out = run(21, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=8, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_uber_textured_opacity_matches(tmp_path):
    """uber with checker opacity (the op/kr2/kt2 products become
    per-hit) stays eligible and matches XLA."""
    src = """
LookAt 0 -4 1  0 0 0.5  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 5
WorldBegin
LightSource "infinite" "rgb L" [.7 .7 .75]
Texture "opcheck" "spectrum" "checkerboard" "float uscale" 3
  "float vscale" 3 "rgb tex1" [1 1 1] "rgb tex2" [.2 .2 .2]
Material "uber" "rgb Kd" [.35 .3 .2] "rgb Ks" [.15 .15 .15]
  "texture opacity" "opcheck" "float roughness" [0.2]
  "bool remaproughness" ["false"]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-1.5 0.5 -1.5  -1.5 0.5 1.5  1.5 0.5 1.5  1.5 0.5 -1.5]
  "float uv" [0 0  0 1  1 1  1 0]
Material "matte" "rgb Kd" [.5 .4 .3]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-4 3 -4  -4 3 4  4 3 4  4 3 -4]
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 24
    out = run(17, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=48, seed=4, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.12)


def test_beckmann_diagnostic_matches(tmp_path, monkeypatch):
    """RENE_MF_DIST=beckmann (the veach lobe-shape diagnostic) swaps
    every microfacet lobe to Beckmann consistently in both engines:
    interpret-mode pallas must still match XLA, and the metal lobe must
    differ measurably from the GGX default."""
    monkeypatch.setenv("RENE_MF_DIST", "beckmann")
    src = """
LookAt 0 -4 1  0 0 0.5  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point from" [1 -2 3]
  "point to" [0 0 0]
Material "metal" "rgb eta" [.2 .92 1.1] "rgb k" [3.9 2.45 2.14]
  "float roughness" [0.2] "bool remaproughness" ["false"]
Shape "sphere" "float radius" 1
Material "matte" "rgb Kd" [.5 .4 .3]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-4 3 -4  -4 3 4  4 3 4  4 3 -4]
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 24
    out = run(11, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=48, seed=9, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.12)

    monkeypatch.delenv("RENE_MF_DIST")
    ggx = render(scene, spp=48, seed=9, engine="xla")
    assert np.abs(ggx["color"] - xla["color"]).max() > 1e-3, \
        "beckmann flag must change the render"


def test_pixel_filter_parsed_and_matches(tmp_path):
    """PixelFilter "triangle" reaches the device config and both
    engines sample the same tent PSF (the goldens' filter)."""
    src = """
LookAt 0 -4 1  0 0 0.5  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
PixelFilter "triangle" "float xwidth" [1.0] "float ywidth" [1.0]
Integrator "path" "integer maxdepth" 3
WorldBegin
LightSource "infinite" "rgb L" [.8 .8 .85]
Material "matte" "rgb Kd" [.6 .3 .2]
Shape "sphere" "float radius" 1
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    assert scene.pixel_filter == ("triangle", 1.0)
    bn, config = build_device_scene(scene)
    assert config.filter_radius == 1.0
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 16
    out = run(7, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp
    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=2, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)


def test_filter_jitter_tent_statistics():
    """filter_jitter: mean 0.5, support [0.5-r, 0.5+r], tent-shaped
    (variance r^2/6)."""
    import jax.numpy as jnp

    from rene_tpu.integrators.camera import filter_jitter
    u = (np.arange(100000, dtype=np.float64) + 0.5) / 100000
    j = np.asarray(filter_jitter(jnp.asarray(u, jnp.float32), 1.0))
    assert abs(j.mean() - 0.5) < 1e-3
    assert j.min() > -0.51 and j.max() < 1.51
    assert abs(j.var() - 1.0 / 6.0) < 2e-3
    box = np.asarray(filter_jitter(jnp.asarray(u, jnp.float32), 0.0))
    np.testing.assert_allclose(box, u, rtol=1e-6)


@pytest.mark.slow
def test_sobol_sampler_matches_and_converges_faster(tmp_path):
    """Sampler "sobol": (a) interpret-mode pallas with the padded
    Owen-scrambled draws statistically matches the PRNG XLA engine;
    (b) at equal spp the sobol render is closer to a high-spp
    reference than the PRNG pallas render (variance reduction)."""
    src = """
LookAt 0 -4 1  0 0 0.5  0 0 1
Camera "perspective" "float fov" 55
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "sobol" "integer pixelsamples" [64]
Integrator "path" "integer maxdepth" 4
WorldBegin
LightSource "infinite" "rgb L" [.5 .5 .55]
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 8 6]
  Material "matte" "rgb Kd" [0 0 0]
  Translate 0 0 3
  Shape "sphere" "float radius" 0.4
AttributeEnd
Material "matte" "rgb Kd" [.6 .45 .3]
Shape "sphere" "float radius" 1
Material "matte" "rgb Kd" [.5 .5 .5]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-6 6 -1.2  -6 -6 -1.2  6 -6 -1.2  6 6 -1.2]
WorldEnd"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    assert scene.sampler == "sobol"
    bn, config = build_device_scene(scene)
    assert config.sampler == "sobol"
    run_s = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 32
    out = run_s(5, spp)
    sob_img = np.asarray(out["radiance"]) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=64, seed=3, engine="xla")
    np.testing.assert_allclose(sob_img.mean(axis=0),
                               xla["color"].mean(axis=(0, 1)),
                               rtol=0.1)

    # variance: per-pixel error vs a higher-spp XLA reference
    ref = render(scene, spp=512, seed=11, engine="xla")["color"]
    ref = ref[::-1].reshape(-1, 3)  # kernel ROWS are y-flipped
    object.__setattr__(config, "sampler", "independent")
    run_i = make_pallas_batch_fn(bn, config, interpret=True)
    ind_img = np.asarray(run_i(5, spp)["radiance"]) / spp
    err_s = np.abs(sob_img - ref).mean()
    err_i = np.abs(ind_img - ref).mean()
    assert err_s < err_i * 0.85, (err_s, err_i)


def test_auto_pack_policy():
    """auto_pack keeps every measured-safe config and caps the r4q Q3
    worker-crash class (see the auto_pack docstring calibration)."""
    from rene_tpu.integrators.pallas_path import auto_pack
    P720, P180 = 1280 * 720, 320 * 180
    assert auto_pack(P720, 51200, 17) == 64            # dragon (r4h)
    assert auto_pack(P720, 126000, 64) == 16           # teapot (r4h H4)
    assert auto_pack(P720, 261630, 5) == 16            # r4q Q3 crash -> 16
    assert auto_pack(P720, 523450, 5) == 16            # r4q Q2
    assert auto_pack(P720, 1047550, 5) == 4
    assert auto_pack(P180, 261630, 5) == 64            # r4k small films
    assert auto_pack(P180, 1047550, 5) == 64
    assert auto_pack(P180, 4 << 20, 5) == 16           # 4M-tri ceiling
    assert auto_pack(P180, 126000, 64, volpath=True) == 64  # fog (r4i)
    assert auto_pack(3840 * 2160, 51200, 17) == 4      # 4K lane budget


def test_packed_sub_tris_vmem_gate():
    """packed ST default stays 16 up to ~900 super-groups, falls to 32
    where the 8-section octant table would blow scoped VMEM (r4q2 A2:
    1.047M tris at ST=16 OOM'd Mosaic's 16 MB limit)."""
    from rene_tpu.integrators.pallas_path import (
        OCT_TABLE_MAX_BYTES, packed_sub_tris)
    assert packed_sub_tris(51200) == 16        # dragon
    assert packed_sub_tris(523450) == 16       # r4k K3 (measured OK)
    assert packed_sub_tris(1047550) == 32      # r4q2 A2 OOM class
    assert packed_sub_tris(4 << 20) == 32
    # the gate itself must leave scoped-VMEM headroom for scratch
    assert OCT_TABLE_MAX_BYTES <= 14 << 20


def _mk_tri(v0, v1, v2, uv0=(0, 0), uv1=(1, 0), uv2=(1, 1),
            n=(0.0, 0.0, 1.0), emissive=False, albedo=(0.5, 0.5, 0.5)):
    """Minimal immediate-tri record for _fuse_parallelograms (the
    fusion reads only emissive/v*/uv*/n* plus the non-geometry keys)."""
    v0, v1, v2 = (tuple(float(x) for x in v) for v in (v0, v1, v2))
    return {"v0": v0, "v1": v1, "v2": v2,
            "uv0": tuple(map(float, uv0)), "uv1": tuple(map(float, uv1)),
            "uv2": tuple(map(float, uv2)),
            "n0": n, "n1": n, "n2": n,
            "emissive": emissive, "albedo": albedo, "mat_type": 1}


def test_parallelogram_fusion_math():
    from rene_tpu.integrators.pallas_path import _fuse_parallelograms
    # unit square split along the (0,0)-(1,1) diagonal
    a = _mk_tri((0, 0, 0), (1, 0, 0), (1, 1, 0))
    b = _mk_tri((0, 0, 0), (1, 1, 0), (0, 1, 0), uv1=(1, 1), uv2=(0, 1))
    tris, quads = _fuse_parallelograms([a, b])
    assert not tris and len(quads) == 1
    q = quads[0]
    # dual-basis mapping: u,v of the 4 corners hit {0,1}^2 exactly, and
    # the affine uv matches the per-vertex assignments
    qa = np.asarray(q["qa"])
    for corner, uvw in (((0, 0, 0), None), ((1, 0, 0), None),
                        ((1, 1, 0), None), ((0, 1, 0), None)):
        rel = np.asarray(corner, float) - qa
        u = float(np.dot(rel, q["du"]))
        v = float(np.dot(rel, q["dv"]))
        assert min(abs(u), abs(u - 1)) < 1e-12
        assert min(abs(v), abs(v - 1)) < 1e-12
        uv = np.asarray(q["uva"]) + u * np.asarray(q["duv1"]) \
            + v * np.asarray(q["duv2"])
        assert np.allclose(uv, corner[:2], atol=1e-12)
    assert np.allclose(q["area"], 1.0)
    assert np.allclose(np.abs(q["gn_unit"]), (0, 0, 1))

    # non-parallelogram pair must NOT fuse
    c = _mk_tri((0, 0, 0), (1, 1, 0), (0, 2, 0))
    tris, quads = _fuse_parallelograms([a, c])
    assert len(tris) == 2 and not quads
    # emissive pairs must NOT fuse (emitter set stays per-tri)
    ae = dict(a, emissive=True)
    be = dict(b, emissive=True)
    tris, quads = _fuse_parallelograms([ae, be])
    assert len(tris) == 2 and not quads
    # differing materials must NOT fuse
    b2 = dict(b, albedo=(0.9, 0.5, 0.5))
    tris, quads = _fuse_parallelograms([a, b2])
    assert len(tris) == 2 and not quads
    # non-flat (bent vertex normals) must NOT fuse
    b3 = dict(b, n2=(0.0, 1.0, 0.0))
    tris, quads = _fuse_parallelograms([a, b3])
    assert len(tris) == 2 and not quads


@pytest.mark.slow
def test_quad_fusion_render_parity(sample_scenes):
    """Fused-quad cornell render is ulp-equal to the per-tri unroll
    (same geometry/normals/uvs; only the intersection algebra differs)."""
    import os
    scene = load_scene(str(sample_scenes / "cornell-box/scene.pbrt"))
    scene.film.xresolution = 32
    scene.film.yresolution = 32
    scene.max_depth_hint = 6
    bn, config = build_device_scene(scene)
    outs = {}
    try:
        for fuse in ("1", "0"):
            os.environ["RENE_QUAD_FUSE"] = fuse
            run = make_pallas_batch_fn(bn, config, interpret=True)
            out = run(3, 24)
            outs[fuse] = {k: np.asarray(out[k])
                          for k in ("radiance", "normal", "albedo")}
    finally:
        os.environ.pop("RENE_QUAD_FUSE", None)
    for k in ("radiance", "normal", "albedo"):
        a, b = outs["1"][k], outs["0"][k]
        assert np.abs(a - b).max() < 1e-3, k


@pytest.mark.slow
@pytest.mark.parametrize("scene_rel", ["cornell-box/scene.pbrt",
                                       "sphere.pbrt"])
def test_attr_elide_render_parity(sample_scenes, scene_rel):
    """Invariant attribute-select elision (_LazyAttr, RENE_ATTR_ELIDE)
    is BIT-identical to the eager per-record select chain: hit lanes
    select the same constants, finalize() restores the engine defaults
    on miss lanes. Covers quads+tris (cornell) and spheres."""
    import os
    scene = load_scene(str(sample_scenes / scene_rel))
    scene.film.xresolution = 32
    scene.film.yresolution = 32
    scene.max_depth_hint = 5
    bn, config = build_device_scene(scene)
    outs = {}
    try:
        for el in ("1", "0"):
            os.environ["RENE_ATTR_ELIDE"] = el
            run = make_pallas_batch_fn(bn, config, interpret=True)
            out = run(3, 16)
            outs[el] = {k: np.asarray(out[k])
                        for k in ("radiance", "normal", "albedo")}
    finally:
        os.environ.pop("RENE_ATTR_ELIDE", None)
    for k in ("radiance", "normal", "albedo"):
        assert np.abs(outs["1"][k] - outs["0"][k]).max() == 0.0, k


def test_checker_background_eligible_and_matches():
    """A checker infinite light (solid subs) is pallas-eligible (round
    5 — was an XLA-fallback cliff) and the inline miss-uv checker
    matches the XLA miss shader."""
    src = """
LookAt 0 -5 0  0 0 0  0 0 1
Camera "perspective" "float fov" 70
Film "image" "integer xresolution" [16] "integer yresolution" [12]
Integrator "path" "integer maxdepth" 3
WorldBegin
Texture "sky" "spectrum" "checkerboard" "float uscale" [8]
  "float vscale" [4] "rgb tex1" [0.9 0.7 0.2] "rgb tex2" [0.1 0.2 0.5]
LightSource "infinite" "texture L" ["sky"]
Material "matte" "rgb Kd" [.5 .4 .3]
Shape "sphere" "float radius" 1
WorldEnd"""
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, config = build_device_scene(scene)
    assert pallas_eligible(bn, config)
    ps = pack_scene(bn, config)
    assert ps.bg_checker is not None
    run = make_pallas_batch_fn(bn, config, interpret=True)
    spp = 8
    out = run(4, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=16, seed=2, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.1)
