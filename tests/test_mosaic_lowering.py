"""TPU Mosaic lowering checks that run WITHOUT a chip.

`jax.export(..., platforms=['tpu'])` runs the Pallas->Mosaic MLIR
lowering pass on any host platform, which is where most Mosaic
legality errors surface (unsupported gathers, slice/tiling alignment,
iota restrictions — the CLAUDE.md landmine class). Interpret-mode
parity tests cannot catch those; before this, the first signal was a
compile failure on real hardware (often mid-outage). These tests
export the production kernel configurations so a lowering regression
fails CI on CPU.

The full Mosaic->binary compile still only happens on device load, so
this is necessary-not-sufficient — but it has caught the bulk of the
landmine class at zero chip cost.
"""
import jax
import jax.numpy as jnp
import pytest

from rene_tpu.integrators.pallas_wave import make_pallas_wave_fn
from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene
from rene_tpu.scene.device import build_device_scene

from .test_wave import SRC


@pytest.fixture(scope="module")
def wave_run():
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    # interpret=False: the real Mosaic lowering path
    run = make_pallas_wave_fn(bn, cfg, interpret=False,
                              samples_per_wave=2, sort_mode="dma",
                              init_mode="kernel")
    assert run is not None
    return run


def test_dma_permutation_lowers_for_tpu(wave_run):
    from jax import export
    state = jax.ShapeDtypeStruct((32, wave_run.n_pad), jnp.float32)
    cum = jax.ShapeDtypeStruct((wave_run.n_pad // 128,), jnp.int32)
    export.export(
        jax.jit(lambda s, p: wave_run.sort_prefix(s, p,
                                                  wave_run.n_pad)),
        platforms=["tpu"])(state, cum)


def test_dma_permutation_chunked_lowers_for_tpu():
    """Production-shape DMA sort: NS_ALL larger than one grid chunk, so
    the SMEM perm BlockSpec is a PARTIAL (1, DMA_G) block — the exact
    configuration that failed Mosaic's 128-divisibility check on-chip
    (r4b D1) while the tiny-scene test above passed because its block
    covered the whole perm array."""
    from jax import export
    src = SRC.replace('"integer xresolution" [24]',
                      '"integer xresolution" [128]').replace(
        '"integer yresolution" [16]', '"integer yresolution" [128]')
    scene = create_scene(parse_pbrt(src), "/tmp")
    bn, cfg = build_device_scene(scene)
    run = make_pallas_wave_fn(bn, cfg, interpret=False,
                              samples_per_wave=2, sort_mode="dma")
    assert run is not None
    ns = run.n_pad // 128
    assert ns > 128, "scene too small to exercise the chunked perm block"
    state = jax.ShapeDtypeStruct((32, run.n_pad), jnp.float32)
    cum = jax.ShapeDtypeStruct((ns,), jnp.int32)
    export.export(
        jax.jit(lambda s, p: run.sort_prefix(s, p, run.n_pad)),
        platforms=["tpu"])(state, cum)


def test_genesis_init_lowers_for_tpu(wave_run):
    from jax import export
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(wave_run.init_state.__wrapped__
                          if hasattr(wave_run.init_state, "__wrapped__")
                          else wave_run.init_state),
                  platforms=["tpu"])(i32, i32)


def test_wave_kernel_step_lowers_for_tpu(wave_run):
    from jax import export
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    state = jax.ShapeDtypeStruct((32, wave_run.n_pad), jnp.float32)
    export.export(
        jax.jit(lambda st, s, l, nt, w: wave_run.kernel_step(
            1, st, s, l, nt, w)),
        platforms=["tpu"])(state, i32, i32, i32, i32)


def test_megakernel_lowers_for_tpu():
    from jax import export

    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    scene = create_scene(parse_pbrt(SRC), "/tmp")
    bn, cfg = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_cluster_lowers_for_tpu(monkeypatch):
    from jax import export

    from rene_tpu.integrators import pallas_path as pp
    from .test_pallas_cluster import big_mesh_scene
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_cluster_packed_lowers_for_tpu(monkeypatch):
    """Sample-in-tile packing (pack=16): the in-kernel slot iota, the
    slot-mixed lane-id/pixkey uint math, and the slot-summed finish
    gather must all lower. Sampler sobol exercises the per-slot Owen
    key mix."""
    import dataclasses

    from jax import export

    from rene_tpu.integrators import pallas_path as pp
    from .test_pallas_cluster import big_mesh_scene
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    cfg = dataclasses.replace(cfg, sampler="sobol")
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=False, pack=16)
    assert run is not None and run.spp_mult == 16
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_cluster_sub_gate_lowers_for_tpu(monkeypatch):
    """SUB_GATE: per-sub-block lax.cond chains inside the member fori
    (scalar select chains over the traced member index) must lower."""
    from jax import export

    from rene_tpu.integrators import pallas_path as pp
    from .test_pallas_cluster import big_mesh_scene
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "SUB_GATE", True)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_hbm_sub_gate_lowers_for_tpu(monkeypatch):
    """SUB_GATE under HBM streaming (DMA + gated sub-unrolls)."""
    from jax import export

    from rene_tpu.integrators import pallas_path as pp
    from .test_pallas_cluster import big_mesh_scene
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    monkeypatch.setattr(pp, "SUB_GATE", True)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_volpath_lowers_for_tpu():
    from jax import export

    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from .test_pallas import FOG_SCENE
    scene = create_scene(parse_pbrt(FOG_SCENE), "/tmp")
    bn, cfg = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_hbm_stream_lowers_for_tpu(monkeypatch):
    """HBM-streamed cluster geometry: the march's make_async_copy DMA
    path must lower."""
    from jax import export

    from rene_tpu.integrators import pallas_path as pp
    from .test_pallas_cluster import big_mesh_scene
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_instanced_lowers_for_tpu(monkeypatch):
    from jax import export

    from rene_tpu.integrators import pallas_path as pp
    from .test_pallas_inst import instanced_scene
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = instanced_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_env_nee_lowers_for_tpu(tmp_path):
    """env_nee kernel machinery (transposed-CDF binary search with
    static-row gathers, pdf gather-then-select, fetch_image's
    gather-then-select) must pass the Mosaic lowering."""
    import numpy as np
    from jax import export

    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from rene_tpu.scene.assets.images import save_pfm

    rng = np.random.RandomState(0)
    save_pfm(str(tmp_path / "env.pfm"),
             (rng.rand(16, 32, 3) * 3).astype(np.float32))
    src = """
Integrator "path" "integer maxdepth" [4]
LookAt 0 1.2 -3.2  0 0.6 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [24] "integer yresolution" [16]
WorldBegin
LightSource "infinite" "string mapname" ["env.pfm"]
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 7 6]
  Shape "trianglemesh" "integer indices" [0 1 2]
    "point P" [-0.6 2.2 -0.6  0.6 2.2 -0.6  0.6 2.2 0.6]
AttributeEnd
Material "matte" "rgb Kd" [0.6 0.5 0.4]
Shape "sphere" "float radius" 0.6
WorldEnd
"""
    scene = create_scene(parse_pbrt(src), str(tmp_path))
    bn, cfg = build_device_scene(scene)
    assert cfg.env_nee
    run = make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_sphere_table_lowers_for_tpu():
    """Sphere-table march (round 5): dynamic 128-lane block slices,
    per-block slab gates and the 128-slot analytic unroll must lower."""
    from jax import export

    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from .test_sphere_table import _many_sphere_scene
    scene = _many_sphere_scene(150)
    bn, cfg = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)


def test_megakernel_light_table_lowers_for_tpu():
    """Distant-light table fold (round 5): dynamic row slices with
    static in-slice reads inside a fori over lights, feeding trace_any
    + bsdf_eval, must lower."""
    from jax import export

    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from .test_light_table import _many_light_scene
    scene = _many_light_scene(24)
    bn, cfg = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, cfg, interpret=False)
    assert run is not None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    export.export(jax.jit(lambda s: run(s, 2)), platforms=["tpu"])(i32)
