"""Wavefront pallas engine (cross-tile ray redistribution) tests.

Interpret-mode RNG streams are attached to the lane id row, so the
between-launch sort is a PURE permutation: sorted and unsorted waves must
produce bit-identical films. Statistical parity vs the XLA integrator
validates the estimator; the cluster test (CLUSTER monkeypatched to 16,
as in test_pallas_cluster) validates the march under redistribution.
"""
import numpy as np
import pytest

from rene_tpu.integrators import pallas_path as pp
from rene_tpu.integrators.pallas_wave import (make_pallas_wave_fn,
                                              wave_supported)
from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene
from rene_tpu.scene.device import build_device_scene

from .test_pallas_cluster import big_mesh_scene

SRC = """
LookAt 3 4 1.5 0 0 0 0 0 1
Camera "perspective" "float fov" 45
Film "image" "integer xresolution" [24] "integer yresolution" [16]
Integrator "path" "integer maxdepth" 5
WorldBegin
LightSource "infinite" "rgb L" [.4 .45 .5]
LightSource "distant" "rgb L" [1 .9 .8] "point from" [2 1 4]
  "point to" [0 0 0]
AttributeBegin
  Material "matte" "rgb Kd" [ .7 .2 .2 ]
  Shape "sphere" "float radius" 1
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 7 5]
  Material "matte" "rgb Kd" [0 0 0]
  Translate 0 0 2.2
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-.5 -.5 0  .5 -.5 0  .5 .5 0  -.5 .5 0]
AttributeEnd
Material "matte" "rgb Kd" [.5 .5 .45]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-5 -5 -1.2  -5 5 -1.2  5 5 -1.2  5 -5 -1.2]
WorldEnd
"""


def test_wave_supported():
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    assert wave_supported(bn, cfg)


@pytest.mark.slow
def test_wave_sort_is_pure_permutation():
    """sorted and unsorted waves agree bit-for-bit (lane-attached RNG)."""
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_rays=True,
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_rays=False,
                            samples_per_wave=2)
    oa = a(9, 2)
    ob = b(9, 2)
    # per-lane paths are identical; only the per-pixel summation order
    # differs (fp non-associativity), so allclose not array_equal
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(oa["albedo"], ob["albedo"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


def test_wave_matches_xla_immediates():
    """Wave estimator (NEE + MIS + distant lights + emitters) matches the
    XLA integrator on an immediates scene."""
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    run = make_pallas_wave_fn(bn, cfg, interpret=True, k_bounces=2)
    spp = min(16, run.samples_per_wave)
    out = run(3, spp)
    mean = out["radiance"].mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=5, engine="xla")
    np.testing.assert_allclose(mean, xla["color"].mean(axis=(0, 1)),
                               rtol=0.1)
    # AOVs accumulate at bounce 0 only
    a_mean = out["albedo"].mean(axis=0) / spp
    xa = xla["albedo"].mean(axis=(0, 1))
    assert np.abs(a_mean - xa).max() < 0.05


@pytest.mark.slow
def test_wave_odd_film_padding():
    """A film whose lane count doesn't divide the tile renders finitely
    and pad lanes contribute nothing."""
    src = SRC.replace('[24]', '[23]').replace('[16]', '[13]')
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, cfg = build_device_scene(scene)
    run = make_pallas_wave_fn(bn, cfg, interpret=True,
                              samples_per_wave=3)
    out = run(2, 3)
    assert out["radiance"].shape == (23 * 13, 3)
    assert np.isfinite(out["radiance"]).all()
    assert (out["radiance"] >= 0).all()


@pytest.mark.slow
def test_wave_key_modes_pure_permutation():
    """The in-kernel WROW_KEY sort (octant x hit-cluster origin bins)
    and the legacy XLA Morton key produce bit-identical per-lane paths
    (lane-attached interpret RNG): only summation order may differ."""
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="kernel",
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="xla",
                            samples_per_wave=2)
    oa = a(7, 2)
    ob = b(7, 2)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_wave_key_modes_cluster(monkeypatch):
    """Kernel-key sorting is a pure permutation on a CLUSTER scene too
    (exercises the winner-cid carry through the march)."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="kernel",
                            samples_per_wave=4)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="xla",
                            samples_per_wave=4)
    oa = a(5, 4)
    ob = b(5, 4)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_wave_key_modes_hbm(monkeypatch):
    """Kernel-key parity with HBM-streamed geometry (cid carry through
    the DMA'd while-march)."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="kernel",
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="xla",
                            samples_per_wave=2)
    oa = a(5, 2)
    ob = b(5, 2)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_wave_volpath_hbm_matches_xla(monkeypatch):
    """Wave volpath over HBM-streamed geometry (wave_bounce_vol +
    DMA'd while-march + medium rows through the slim sort) matches the
    XLA volpath integrator — the r4s/r4t auto-policy class."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    from .test_pallas_cluster import fog_mesh_scene
    scene = fog_mesh_scene()
    bn, cfg = build_device_scene(scene)
    assert wave_supported(bn, cfg)
    run = make_pallas_wave_fn(bn, cfg, interpret=True, k_bounces=2,
                              samples_per_wave=8)
    spp = 8
    out = run(3, spp)
    mean = out["radiance"].mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=5, engine="xla")
    np.testing.assert_allclose(mean, xla["color"].mean(axis=(0, 1)),
                               rtol=0.15)


@pytest.mark.slow
def test_wave_matches_xla_cluster(monkeypatch):
    """Cluster-march wave (redistribution between bounces) matches XLA."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = make_pallas_wave_fn(bn, cfg, interpret=True, k_bounces=2,
                              samples_per_wave=8)
    spp = 8
    out = run(3, spp)
    mean = out["radiance"].mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=5, engine="xla")
    np.testing.assert_allclose(mean, xla["color"].mean(axis=(0, 1)),
                               rtol=0.15)
    n_mean = np.abs(out["normal"] / spp).mean(axis=0)
    xn_mean = np.abs(xla["normal"]).mean(axis=(0, 1))
    assert np.abs(n_mean - xn_mean).max() < 0.05


@pytest.mark.slow
def test_wave_render_driver():
    """render(engine='wave') drives the wave engine end-to-end."""
    from rene_tpu.render import render
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    out = render(scene, spp=4, seed=1, engine="wave")
    img = out["color"]
    assert img.shape == (16, 24, 3)
    assert np.isfinite(img).all()
    # background pixel = infinite light color (unoccluded from camera)
    np.testing.assert_allclose(img[0, 0], [0.4, 0.45, 0.5], atol=0.25)


@pytest.mark.slow
def test_wave_sort_gran_pure_permutation():
    """Coarse 128-lane bucket redistribution (sort_gran=128) is a pure
    permutation too: it must agree bit-for-bit per-lane with the
    per-lane sort (lane-attached RNG) AND with no sort at all; only the
    per-pixel summation order may differ."""
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=128,
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=1,
                            samples_per_wave=2)
    oa = a(9, 2)
    ob = b(9, 2)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(oa["albedo"], ob["albedo"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_wave_sort_gran_cluster(monkeypatch):
    """sort_gran=128 on a CLUSTER scene (the production big-mesh case):
    pure permutation vs the per-lane sort, and the slice-count alive
    bound never strands an alive lane past the march prefix."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=128,
                            samples_per_wave=4)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=1,
                            samples_per_wave=4)
    oa = a(5, 4)
    ob = b(5, 4)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_wave_volpath_sort_is_pure_permutation():
    """volpath waves: sorted and unsorted agree bit-for-bit — this
    exercises the WROW_MED row's explicit permutation in the slim sort
    (a missed med-row gather would misattach media to rays)."""
    from .test_pallas import FOG_SCENE
    src = FOG_SCENE.replace('[16]', '[10]').replace('maxdepth 6',
                                                    'maxdepth 4')
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, cfg = build_device_scene(scene)
    assert wave_supported(bn, cfg)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_rays=True,
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_rays=False,
                            samples_per_wave=2)
    oa = a(9, 2)
    ob = b(9, 2)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_wave_volpath_matches_xla_integrator():
    """Wave volpath (wave_bounce_vol: medium sampling, phase NEE via tr
    marching, interface tracking, no RR) statistically matches the XLA
    volpath integrator."""
    from .test_pallas import FOG_SCENE
    scene = create_scene(parse_pbrt(FOG_SCENE), "/tmp")
    bn, cfg = build_device_scene(scene)
    run = make_pallas_wave_fn(bn, cfg, interpret=True, k_bounces=2)
    spp = min(16, run.samples_per_wave)
    out = run(3, spp)
    mean = out["radiance"].mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=48, seed=5, engine="xla")
    np.testing.assert_allclose(mean, xla["color"].mean(axis=(0, 1)),
                               rtol=0.1)


def test_wave_genesis_init_matches_xla_init():
    """In-kernel genesis init (init_mode="kernel", pallas_path
    wave_genesis) reproduces the XLA init exactly on the real lanes
    under the sobol sampler: same sort keys, same per-lane want/alive,
    near-identical camera rays (the kernel draws the identical
    Owen-scrambled point through ld2; only mantissa-trick rounding of
    the unit floats differs)."""
    import jax.numpy as jnp
    src = SRC.replace("WorldBegin", 'Sampler "sobol"\nWorldBegin', 1)
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, samples_per_wave=2,
                            init_mode="kernel")
    b = make_pallas_wave_fn(bn, cfg, interpret=True, samples_per_wave=2,
                            init_mode="xla")
    sa, pa = a.init_state(jnp.int32(7), jnp.int32(2))
    sb, pb = b.init_state(jnp.int32(7), jnp.int32(2))
    sa, sb = np.asarray(sa), np.asarray(sb)
    assert np.array_equal(np.asarray(pa), np.asarray(pb))
    n_real = 24 * 16 * 2
    # integer-exact rows: alive/rays/lane/px/py/smp/dep/want
    np.testing.assert_array_equal(sa[12:20], sb[12:20])
    ka = sa[pp.WROW_KEY].view(np.int32)
    kb = sb[pp.WROW_KEY].view(np.int32)
    np.testing.assert_array_equal(ka, kb)
    # real-lane camera rays agree to unit-float rounding
    np.testing.assert_allclose(sa[0:12, :n_real], sb[0:12, :n_real],
                               atol=1e-5)


@pytest.mark.slow
def test_wave_genesis_full_wave_parity():
    """A full wave run from the genesis init matches the XLA-init wave
    (sobol draws are deterministic by (pixel, sample, slot))."""
    src = SRC.replace("WorldBegin", 'Sampler "sobol"\nWorldBegin', 1)
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, samples_per_wave=2,
                            init_mode="kernel")
    b = make_pallas_wave_fn(bn, cfg, interpret=True, samples_per_wave=2,
                            init_mode="xla")
    oa = a(9, 2)
    ob = b(9, 2)
    assert oa["rays"] == ob["rays"]
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(oa["albedo"], ob["albedo"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_wave_dma_sort_matches_gather():
    """sort_mode="dma" — the Pallas slice-permutation (G outstanding
    HBM->VMEM async copies at dynamic 128-aligned lane offsets, AOV
    rows streamed through unpermuted) — agrees bit-for-bit with the
    XLA slice gather at the same granularity."""
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_mode="dma",
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=128,
                            samples_per_wave=2)
    oa = a(9, 2)
    ob = b(9, 2)
    assert oa["rays"] == ob["rays"]
    np.testing.assert_array_equal(oa["radiance"], ob["radiance"])
    np.testing.assert_array_equal(oa["albedo"], ob["albedo"])


@pytest.mark.slow
def test_wave_dma_sort_volpath_cluster(monkeypatch):
    """DMA slice permutation on a volpath scene (med row travels inside
    the padded sort range) and on a CLUSTER scene (production big-mesh
    case) both match the gather path."""
    from .test_pallas import FOG_SCENE
    src = FOG_SCENE.replace("[16]", "[10]").replace("maxdepth 6",
                                                    "maxdepth 4")
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_mode="dma",
                            samples_per_wave=2)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=128,
                            samples_per_wave=2)
    oa = a(5, 2)
    ob = b(5, 2)
    assert oa["rays"] == ob["rays"]
    np.testing.assert_array_equal(oa["radiance"], ob["radiance"])

    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    a = make_pallas_wave_fn(bn, cfg, interpret=True, sort_mode="dma",
                            samples_per_wave=4)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, sort_gran=128,
                            samples_per_wave=4)
    oa = a(5, 4)
    ob = b(5, 4)
    assert oa["rays"] == ob["rays"]
    # spw=4: per-pixel summation order differs (dma finish sums in
    # static slot order), so last-ulp noise is expected
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)


def test_wave_env_knob_resolution(monkeypatch):
    """RENE_WAVE_SORT / RENE_WAVE_INIT / RENE_WAVE_GRAN resolve onto
    the runner (the driver surface A/Bs configs without code changes);
    explicit arguments win over the environment."""
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    monkeypatch.setenv("RENE_WAVE_SORT", "dma")
    monkeypatch.setenv("RENE_WAVE_INIT", "kernel")
    run = make_pallas_wave_fn(bn, cfg, interpret=True,
                              samples_per_wave=2)
    assert run.sort_mode == "dma"
    assert run.init_mode == "kernel"
    assert run.sort_gran == 128  # dma implies slice-granular counts
    monkeypatch.delenv("RENE_WAVE_SORT")
    monkeypatch.delenv("RENE_WAVE_INIT")
    monkeypatch.setenv("RENE_WAVE_GRAN", "128")
    run = make_pallas_wave_fn(bn, cfg, interpret=True,
                              samples_per_wave=2)
    assert run.sort_mode == "gather" and run.sort_gran == 128
    run = make_pallas_wave_fn(bn, cfg, interpret=True,
                              samples_per_wave=2, sort_gran=1)
    assert run.sort_gran == 1
    assert run.sub_gate is True  # wave default: gating ON (r4f T1)
    monkeypatch.setenv("RENE_WAVE_SUB_GATE", "0")
    run = make_pallas_wave_fn(bn, cfg, interpret=True,
                              samples_per_wave=2)
    assert run.sub_gate is False
    run = make_pallas_wave_fn(bn, cfg, interpret=True,
                              samples_per_wave=2, sub_gate=True)
    assert run.sub_gate is True  # explicit argument beats the env


def test_auto_spw_policy():
    """Auto spw: cap-96 knee on hardware, lane budget on big films,
    cap-24 under interpret, spp_hint clamp (r4p/r4p2 sweeps)."""
    from rene_tpu.integrators.pallas_wave import auto_spw
    assert auto_spw(320 * 180) == 96
    assert auto_spw(1280 * 720) == (3 << 23) // (1280 * 720)
    assert auto_spw(1920 * 1080) == (3 << 23) // (1920 * 1080)
    assert auto_spw(320 * 180, interpret=True) == 24
    assert auto_spw(320 * 180, spp_hint=8) == 8
    assert auto_spw(320 * 180, spp_hint=1) == 2
    assert auto_spw(320 * 180, spp_hint=4096) == 96
