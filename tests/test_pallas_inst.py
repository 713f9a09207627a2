"""Shared-BLAS instancing: ObjectInstance replays march ONE object-space
cluster table with per-instance ray transforms (reference TLAS/BLAS
sharing, main.rs:2739-2908) instead of replicating geometry into the
table. CLUSTER is monkeypatched to 16 as in test_pallas_cluster."""
import numpy as np
import pytest

from rene_tpu.integrators import pallas_path as pp
from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene
from rene_tpu.scene.device import build_device_scene

from .test_pallas_cluster import uv_sphere


def instanced_scene(n_inst=12):
    verts, idx = uv_sphere(nu=20, nv=12, r=0.45, cy=0.0)
    p = " ".join(f"{x:.5f} {y:.5f} {z:.5f}" for x, y, z in verts)
    i = " ".join(map(str, idx))
    insts = []
    for k in range(n_inst):
        x = (k % 4) * 1.4 - 2.1
        z = (k // 4) * 1.4 - 1.4
        rot = 30.0 * k
        s = 0.8 + 0.1 * (k % 3)
        insts.append(f"""AttributeBegin
  Translate {x:.2f} {z:.2f} 0.45
  Rotate {rot:.1f} 0 0 1
  Scale {s:.2f} {s:.2f} {s:.2f}
  ObjectInstance "ball"
AttributeEnd""")
    txt = f"""
Integrator "path" "integer maxdepth" [5]
LookAt 0 -6 4  0 0 0  0 0 1
Camera "perspective" "float fov" [48]
Film "image" "integer xresolution" [24] "integer yresolution" [16]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 9 8]
  Shape "trianglemesh" "point P" [ -0.8 -0.8 4  0.8 -0.8 4  0.8 0.8 4
    -0.8 0.8 4 ] "integer indices" [ 0 2 1 0 3 2 ]
AttributeEnd
ObjectBegin "ball"
  Material "matte" "rgb Kd" [0.7 0.3 0.25]
  Shape "trianglemesh" "point P" [ {p} ] "integer indices" [ {i} ]
ObjectEnd
{chr(10).join(insts)}
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [ -8 -8 0  8 -8 0  8 8 0  -8 8 0 ]
  "integer indices" [ 0 1 2 0 2 3 ]
WorldEnd
"""
    return create_scene(parse_pbrt(txt), ".")


def test_shared_blas_packing():
    scene = instanced_scene()
    bn, cfg = build_device_scene(scene)
    assert cfg.num_triangles > pp.MAX_TRIS
    assert pp.pallas_eligible(bn, cfg)
    ps = pp.pack_scene(bn, cfg)
    assert ps.inst_meshes and len(ps.inst_meshes) == 1
    im = ps.inst_meshes[0]
    assert im["n_inst"] == 12
    # table memory is O(mesh), not O(instances x mesh)
    per_mesh_slots = im["n_clusters"] * pp.CLUSTER
    ntri_blas = int(bn["inst_prim_count"][
        np.nonzero(bn["inst_blas"] >= 0)[0][0]])
    assert per_mesh_slots < 2 * ntri_blas + pp.SUPER * pp.CLUSTER
    # the merged world-space table only holds the floor quad's 2 tris
    # (padded to one SUPER group) — not the instanced geometry
    assert ps.n_clusters <= pp.SUPER
    # every instance got its own material slot (w2o rows + slot lane)
    assert im["inst_rows"].shape[1] == 128
    # 1 merged-table slot (floor) + one per instance
    assert len(ps.mesh_mats) == 13
    # instance rows carry invertible affines
    row = im["inst_rows"][3]
    m = row[:12].reshape(3, 4)
    assert abs(np.linalg.det(m[:, :3])) > 1e-6


def test_replication_off_below_saving_threshold():
    """Two instances of a small mesh keep the replicated path (sharing
    overhead would outweigh the slot saving)."""
    scene = instanced_scene(n_inst=2)
    bn, cfg = build_device_scene(scene)
    ps = pp.pack_scene(bn, cfg)
    if cfg.num_triangles > pp.MAX_TRIS:
        assert not ps.inst_meshes
        assert ps.n_clusters > 0


@pytest.mark.slow
def test_instanced_wave_key_modes(monkeypatch):
    """The wave engine's in-kernel sort key threads the winner-cluster
    id through the per-instance object-space march (disjoint global id
    ranges per instance); kernel-key and xla-key waves are bit-identical
    per lane, so films agree to summation order."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = instanced_scene()
    bn, cfg = build_device_scene(scene)
    from rene_tpu.integrators.pallas_wave import make_pallas_wave_fn
    a = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="kernel",
                            samples_per_wave=4)
    b = make_pallas_wave_fn(bn, cfg, interpret=True, key_mode="xla",
                            samples_per_wave=4)
    oa = a(11, 4)
    ob = b(11, 4)
    np.testing.assert_allclose(oa["radiance"], ob["radiance"],
                               rtol=1e-5, atol=1e-6)
    assert oa["rays"] == ob["rays"]


@pytest.mark.slow
def test_instanced_matches_xla(monkeypatch):
    """Interpret-mode shared-table march (object-space rays, W2O^T
    normals, per-instance material slots) matches the XLA integrator,
    which traces the replicated world-space geometry."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = instanced_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    assert run is not None
    spp = 8
    out = run(3, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=16, seed=5, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    # deterministic AOVs agree tightly (normals transformed back to
    # world via W2O^T must match the baked world-space normals)
    n_mean = np.abs(np.asarray(out["normal"]) / spp).mean(axis=0)
    xn_mean = np.abs(xla["normal"]).mean(axis=(0, 1))
    assert np.abs(n_mean - xn_mean).max() < 0.05
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = np.abs(xla["albedo"]).mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05
