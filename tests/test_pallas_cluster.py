"""Clustered big-mesh pallas path (scenes over the immediates limit).

Validates the VMEM cluster-table march (Morton-ordered 128-tri clusters,
AABB-gated unrolled Moller-Trumbore) against the XLA wavefront integrator
on a synthetic >MAX_TRIS scene. CLUSTER is monkeypatched down to 16 so the
interpret-mode XLA-on-CPU compile of the unrolled cluster body stays fast;
the kernel code path is identical at any cluster width.
"""
import numpy as np
import pytest

from rene_tpu.integrators import pallas_path as pp
from rene_tpu.pbrt import parse_pbrt
from rene_tpu.scene import create_scene
from rene_tpu.scene.device import build_device_scene


def uv_sphere(nu=24, nv=14, r=0.6, cy=0.6):
    verts, idx = [], []
    for j in range(nv + 1):
        th = np.pi * j / nv
        for i in range(nu):
            ph = 2 * np.pi * i / nu
            verts.append((r * np.sin(th) * np.cos(ph),
                          cy + r * np.cos(th),
                          r * np.sin(th) * np.sin(ph)))

    def vid(i, j):
        return j * nu + (i % nu)

    for j in range(nv):
        for i in range(nu):
            a, b = vid(i, j), vid(i + 1, j)
            c, d = vid(i + 1, j + 1), vid(i, j + 1)
            if j > 0:
                idx += [a, b, c]
            if j < nv - 1:
                idx += [a, c, d]
    return verts, idx


def big_mesh_scene():
    verts, idx = uv_sphere()
    p = " ".join(f"{x:.5f} {y:.5f} {z:.5f}" for x, y, z in verts)
    i = " ".join(map(str, idx))
    # ceiling light normal points down ([0 1 2] winding, one-sided emitter)
    txt = f"""
Integrator "path" "integer maxdepth" [5]
LookAt 0 1.2 -3.2  0 0.6 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [24] "integer yresolution" [16]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [12 11 9]
  Shape "trianglemesh" "point P" [ -0.7 2.2 -0.7  0.7 2.2 -0.7  0.7 2.2 0.7
    -0.7 2.2 0.7 ] "integer indices" [ 0 1 2 0 2 3 ]
AttributeEnd
Material "matte" "rgb Kd" [0.75 0.25 0.2]
Shape "trianglemesh" "point P" [ {p} ] "integer indices" [ {i} ]
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [ -6 0 -6  6 0 -6  6 0 6  -6 0 6 ]
  "integer indices" [ 0 1 2 0 2 3 ]
WorldEnd
"""
    return create_scene(parse_pbrt(txt), ".")


def test_cluster_eligibility_and_packing():
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    assert cfg.num_triangles > pp.MAX_TRIS
    assert pp.pallas_eligible(bn, cfg)
    ps = pp.pack_scene(bn, cfg)
    assert ps.n_clusters > 0
    assert len(ps.tris) == 2                      # the 2 emissive quad tris
    assert all(t["emissive"] for t in ps.tris)
    assert len(ps.mesh_mats) == 2                 # sphere + floor matte
    assert ps.mesh_geom.shape[0] == pp.MESH_ROWS
    # sub-block AABBs must cover their member triangles
    box = ps.mesh_geom[pp.ROW_BOX].reshape(ps.n_clusters, pp.CLUSTER)
    v0 = ps.mesh_geom[pp.ROW_V0:pp.ROW_V0 + 3]
    real = (ps.mesh_geom[pp.ROW_E1:pp.ROW_E1 + 3] != 0).any(axis=0)
    n_sub, sub = pp._sub_split(pp.CLUSTER)
    for c in range(ps.n_clusters):
        for s in range(n_sub):
            lo = c * pp.CLUSTER + s * sub
            sl = slice(lo, lo + sub)
            m = real[sl]
            b = box[c, s * 6:s * 6 + 6]
            if not m.any():
                assert b[0] > b[3]                # inverted: skipped
                continue
            assert (v0[:, sl][:, m].min(axis=1) >= b[0:3] - 1e-5).all()
            assert (v0[:, sl][:, m].max(axis=1) <= b[3:6] + 1e-5).all()


def test_dragon_is_cluster_eligible(sample_scenes):
    from rene_tpu.scene import load_scene
    scene = load_scene(str(sample_scenes / "dragon/scene.pbrt"))
    bn, cfg = build_device_scene(scene)
    assert cfg.num_triangles > pp.MAX_TRIS
    assert pp.pallas_eligible(bn, cfg)


@pytest.mark.slow
def test_cluster_matches_xla(monkeypatch):
    """Interpret-mode cluster march statistically matches the XLA path."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(3, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=5, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    # deterministic AOVs agree tightly
    n_mean = np.abs(np.asarray(out["normal"]) / spp).mean(axis=0)
    xn_mean = np.abs(xla["normal"]).mean(axis=(0, 1))
    assert np.abs(n_mean - xn_mean).max() < 0.05
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = np.abs(xla["albedo"]).mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


def substrate_checker_scene():
    """Small immediates-only scene: substrate panel over a checker floor."""
    txt = """
Integrator "path" "integer maxdepth" [5]
LookAt 0 1.0 -3.0  0 0.5 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [24] "integer yresolution" [16]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 10 9]
  Shape "trianglemesh" "point P" [ -0.6 2.0 -0.6  0.6 2.0 -0.6  0.6 2.0 0.6
    -0.6 2.0 0.6 ] "integer indices" [ 0 1 2 0 2 3 ]
AttributeEnd
Material "substrate" "rgb Kd" [0.6 0.3 0.2] "rgb Ks" [0.1 0.1 0.1]
  "float uroughness" [0.05] "float vroughness" [0.05]
  "bool remaproughness" ["false"]
Shape "trianglemesh" "point P" [ -0.8 0.02 -0.8  0.8 0.02 -0.8  0.8 1.1 0.4
  -0.8 1.1 0.4 ] "integer indices" [ 0 1 2 0 2 3 ]
Texture "chk" "spectrum" "checkerboard" "float uscale" [4] "float vscale" [4]
  "rgb tex1" [0.1 0.1 0.5] "rgb tex2" [0.8 0.8 0.3]
Material "matte" "texture Kd" ["chk"]
Shape "trianglemesh" "point P" [ -5 0 -5  5 0 -5  5 0 5  -5 0 5 ]
  "integer indices" [ 0 1 2 0 2 3 ]
WorldEnd
"""
    return create_scene(parse_pbrt(txt), ".")


@pytest.mark.slow
def test_substrate_checker_matches_xla():
    """Substrate BSDF + checker Kd through the megakernel vs the XLA path."""
    scene = substrate_checker_scene()
    bn, cfg = build_device_scene(scene)
    assert pp.pallas_eligible(bn, cfg)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 16
    out = run(7, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=32, seed=11, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    # checker albedo AOV is deterministic per pixel
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = xla["albedo"].mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


def test_hbm_packing(monkeypatch):
    """HBM streaming mode activates over HBM_MIN_TRIS and the box table
    covers every super group (super AABB lanes 0-5, sub boxes after)."""
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    assert pp.pallas_eligible(bn, cfg)
    ps = pp.pack_scene(bn, cfg)
    assert ps.mesh_hbm and ps.mesh_box is not None
    nsup = ps.n_clusters // pp.SUPER
    box = ps.mesh_geom[pp.ROW_BOX].reshape(ps.n_clusters, pp.CLUSTER)
    n_sub, _ = pp._sub_split(pp.CLUSTER)
    g_rows, rowlane = pp._box_layout(n_sub)
    sup_lane = n_sub * 6
    assert ps.mesh_box.shape[0] >= nsup * g_rows
    assert ps.mesh_box.shape[1] == 128
    # super boxes copied from the first cluster block of each group
    np.testing.assert_array_equal(
        ps.mesh_box[0:nsup * g_rows:g_rows, 0:6],
        box[::pp.SUPER, sup_lane:sup_lane + 6])
    # member sub boxes at their packed (row, lane) slots
    for g in range(pp.SUPER):
        for s in range(n_sub):
            r, lane = rowlane(g * n_sub + s)
            np.testing.assert_array_equal(
                ps.mesh_box[r:nsup * g_rows:g_rows, lane:lane + 6],
                box[g::pp.SUPER, s * 6:s * 6 + 6])


@pytest.mark.slow
def test_hbm_streaming_matches_xla(monkeypatch):
    """Interpret-mode HBM streaming march (box-table gate + per-group DMA
    into scratch) statistically matches the XLA path."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(3, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=5, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    n_mean = np.abs(np.asarray(out["normal"]) / spp).mean(axis=0)
    xn_mean = np.abs(xla["normal"]).mean(axis=(0, 1))
    assert np.abs(n_mean - xn_mean).max() < 0.05
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = np.abs(xla["albedo"]).mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


def fog_mesh_scene():
    """Volpath scene whose fog container is a big triangle mesh: the
    cluster table must carry (material, interior, exterior) so medium
    interfaces survive cluster hits."""
    verts, idx = uv_sphere(r=1.4, cy=0.0)
    p = " ".join(f"{x:.5f} {y:.5f} {z:.5f}" for x, y, z in verts)
    i = " ".join(map(str, idx))
    txt = f"""
Integrator "volpath" "integer maxdepth" [5]
LookAt 0 0.4 -4.2  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [24] "integer yresolution" [16]
WorldBegin
LightSource "distant" "rgb L" [2 2 2] "point from" [0 2 -1] "point to" [0 0 0]
AttributeBegin
  MakeNamedMedium "fog" "rgb sigma_a" [.15 .2 .25] "rgb sigma_s" [.7 .6 .5]
    "float g" 0.1
  MediumInterface "fog" ""
  Material "none"
  Shape "trianglemesh" "point P" [ {p} ] "integer indices" [ {i} ]
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 6 4]
  Material "matte" "rgb Kd" [0 0 0]
  Shape "trianglemesh" "point P" [ -0.5 2.4 -0.5  0.5 2.4 -0.5  0.5 2.4 0.5
    -0.5 2.4 0.5 ] "integer indices" [ 0 1 2 0 2 3 ]
AttributeEnd
Material "matte" "rgb Kd" [0.5 0.45 0.4]
Shape "trianglemesh" "point P" [ -6 -1.6 -6  6 -1.6 -6  6 -1.6 6  -6 -1.6 6 ]
  "integer indices" [ 0 1 2 0 2 3 ]
WorldEnd
"""
    return create_scene(parse_pbrt(txt), ".")


def test_volpath_cluster_packing():
    scene = fog_mesh_scene()
    bn, cfg = build_device_scene(scene)
    assert cfg.integrator == "volpath"
    assert cfg.num_triangles > pp.MAX_TRIS
    assert pp.pallas_eligible(bn, cfg)
    ps = pp.pack_scene(bn, cfg)
    assert ps.n_clusters > 0 and ps.integrator == "volpath"
    # the fog mesh's material slot carries its interior medium index
    assert any(r["imed"] != 0 for r in ps.mesh_mats)
    assert any(r["mat_type"] == 0 for r in ps.mesh_mats)  # MAT_NONE


@pytest.mark.slow
def test_volpath_cluster_matches_xla(monkeypatch):
    """Interpret-mode volpath through the cluster march statistically
    matches the XLA volpath integrator."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = fog_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(5, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=9, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)


@pytest.mark.slow
def test_volpath_hbm_matches_xla(monkeypatch):
    """Interpret-mode volpath through the HBM streaming march (medium
    interfaces carried by the DMA'd cluster groups) statistically
    matches the XLA volpath integrator — the deep-volumetric-big-mesh
    combination the auto policy routes on real scenes."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    scene = fog_mesh_scene()
    bn, cfg = build_device_scene(scene)
    ps = pp.pack_scene(bn, cfg)
    assert ps.mesh_hbm and ps.integrator == "volpath"
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(5, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=9, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)


def textured_mesh_scene(tmp_path=None, image=False):
    """Big mesh whose matte Kd is a checker (or imagemap) — per-hit uv
    must come from the cluster table's uv rows."""
    verts, idx = uv_sphere()
    # spherical uvs per vertex (nu x (nv+1) grid)
    nu, nv = 24, 14
    uvs = []
    for j in range(nv + 1):
        for i in range(nu):
            uvs.append((i / nu, j / nv))
    p = " ".join(f"{x:.5f} {y:.5f} {z:.5f}" for x, y, z in verts)
    i_s = " ".join(map(str, idx))
    uv_s = " ".join(f"{u:.5f} {v:.5f}" for u, v in uvs)
    if image:
        import numpy as np_
        tex = np_.zeros((8, 16, 3), np_.float32)
        tex[..., 0] = np_.linspace(0.1, 0.9, 16)[None, :]
        tex[..., 1] = 0.35
        tex[..., 2] = np_.linspace(0.8, 0.1, 8)[:, None]
        with open(tmp_path / "kd.pfm", "wb") as f:
            f.write(b"PF\n16 8\n-1.0\n")
            f.write(tex[::-1].astype("<f4").tobytes())
        kd = ('Texture "kdmap" "spectrum" "imagemap" '
              '"string filename" "kd.pfm"\n'
              'Material "matte" "texture Kd" ["kdmap"]')
    else:
        kd = ('Texture "chk" "spectrum" "checkerboard" "float uscale" [6]'
              ' "float vscale" [3] "rgb tex1" [0.8 0.2 0.2]'
              ' "rgb tex2" [0.2 0.2 0.8]\n'
              'Material "matte" "texture Kd" ["chk"]')
    txt = f"""
Integrator "path" "integer maxdepth" [5]
LookAt 0 1.2 -3.2  0 0.6 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [24] "integer yresolution" [16]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [12 11 9]
  Shape "trianglemesh" "point P" [ -0.7 2.2 -0.7  0.7 2.2 -0.7  0.7 2.2 0.7
    -0.7 2.2 0.7 ] "integer indices" [ 0 1 2 0 2 3 ]
AttributeEnd
{kd}
Shape "trianglemesh" "point P" [ {p} ] "integer indices" [ {i_s} ]
  "float uv" [ {uv_s} ]
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [ -6 0 -6  6 0 -6  6 0 6  -6 0 6 ]
  "integer indices" [ 0 1 2 0 2 3 ]
WorldEnd
"""
    base = str(tmp_path) if tmp_path is not None else "."
    return create_scene(parse_pbrt(txt), base)


def test_textured_cluster_packing():
    scene = textured_mesh_scene()
    bn, cfg = build_device_scene(scene)
    assert cfg.num_triangles > pp.MAX_TRIS
    assert pp.pallas_eligible(bn, cfg)
    ps = pp.pack_scene(bn, cfg)
    assert ps.mesh_geom.shape[0] == pp.MESH_ROWS_UV
    assert any(r.get("tex", ("solid",))[0] == "checker"
               for r in ps.mesh_mats)


@pytest.mark.slow
def test_checker_cluster_matches_xla(monkeypatch):
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = textured_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(5, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=7, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    # checker albedo AOV is deterministic
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = xla["albedo"].mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


@pytest.mark.slow
def test_imagemap_cluster_matches_xla(monkeypatch, tmp_path):
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = textured_mesh_scene(tmp_path, image=True)
    bn, cfg = build_device_scene(scene)
    assert pp.pallas_eligible(bn, cfg)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(5, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=7, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = xla["albedo"].mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


@pytest.mark.slow
def test_hbm_textured_cluster_matches_xla(monkeypatch, tmp_path):
    """HBM streaming + uv rows + imagemap Kd together: the 32-row table
    DMA stays tile-aligned and the fetch matches XLA."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    monkeypatch.setattr(pp, "HBM_MIN_TRIS", 64)
    scene = textured_mesh_scene(tmp_path, image=True)
    bn, cfg = build_device_scene(scene)
    assert pp.pallas_eligible(bn, cfg)
    ps = pp.pack_scene(bn, cfg)
    assert ps.mesh_hbm and ps.mesh_geom.shape[0] == pp.MESH_ROWS_UV
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    spp = 12
    out = run(5, spp)
    pallas_mean = np.asarray(out["radiance"]).mean(axis=0) / spp

    from rene_tpu.render import render
    xla = render(scene, spp=24, seed=7, engine="xla")
    xla_mean = xla["color"].mean(axis=(0, 1))
    np.testing.assert_allclose(pallas_mean, xla_mean, rtol=0.15)
    a_mean = np.asarray(out["albedo"]).mean(axis=0) / spp
    xa_mean = xla["albedo"].mean(axis=(0, 1))
    assert np.abs(a_mean - xa_mean).max() < 0.05


def test_march_break_optin_matches(monkeypatch):
    """The opt-in early-break marches (OCT_BREAK/OCT_BREAK_ANY with
    OCT_BREAK_VMEM) must render identically to the default fori
    marches — the break is a provable no-op up to exact-t ties."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    spp = 8
    base = pp.make_pallas_batch_fn(bn, cfg, interpret=True)(3, spp)
    monkeypatch.setattr(pp, "OCT_BREAK", True)
    monkeypatch.setattr(pp, "OCT_BREAK_ANY", True)
    monkeypatch.setattr(pp, "OCT_BREAK_VMEM", True)
    brk = pp.make_pallas_batch_fn(bn, cfg, interpret=True)(3, spp)
    np.testing.assert_allclose(np.asarray(brk["radiance"]),
                               np.asarray(base["radiance"]),
                               rtol=1e-5, atol=1e-5)


def test_sub_split_clamps_to_lane_budget(monkeypatch):
    """SUB_TRIS=4 at CLUSTER=128 would need 32*6+6=198 ROW_BOX lanes;
    the clamp halves n_sub until it fits (16 sub-blocks of 8 — the
    effective floor of the SUB_TRIS sweep)."""
    monkeypatch.setattr(pp, "SUB_TRIS", 4)
    n_sub, sub = pp._sub_split(128)
    assert n_sub * 6 + 6 <= 128
    assert (n_sub, sub) == (16, 8)
    n_sub, sub = pp._sub_split(64)
    assert n_sub * 6 + 6 <= 64
    assert n_sub * sub == 64


def test_sub_gate_matches(monkeypatch):
    """SUB_GATE (per-sub-block MT conds inside the member fori) must
    render identically to the ungated member march: a skipped sub-box
    cannot contain a hit inside [tmin, t_best/tmax]."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    spp = 8
    base = pp.make_pallas_batch_fn(bn, cfg, interpret=True)(3, spp)
    monkeypatch.setattr(pp, "SUB_GATE", True)
    gated = pp.make_pallas_batch_fn(bn, cfg, interpret=True)(3, spp)
    for k in ("radiance", "normal", "albedo"):
        np.testing.assert_allclose(np.asarray(gated[k]),
                                   np.asarray(base[k]),
                                   rtol=1e-5, atol=1e-5)


def test_oct_packing_invariants(monkeypatch):
    """Octant-section layout (mesh_oct): per section, the row-0
    IDX_LANE indices are a permutation of the groups, the MINPJ keys
    are the min corner projections onto the octant sign vector and
    monotone nondecreasing, and each row carries the indexed group's
    super AABB."""
    monkeypatch.setattr(pp, "CLUSTER", 16)  # n_clusters=64 -> n_super=8
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    ps = pp.pack_scene(bn, cfg)
    assert ps.mesh_oct, "fixture must be big enough to enable oct"
    nsup = ps.n_clusters // pp.SUPER
    assert nsup >= 2
    n_sub, _ = pp._sub_split(pp.CLUSTER)
    g_rows, _ = pp._box_layout(n_sub)
    sup_lane = n_sub * 6
    box = ps.mesh_geom[pp.ROW_BOX].reshape(ps.n_clusters, pp.CLUSTER)
    sup = box[::pp.SUPER, sup_lane:sup_lane + 6]  # geometry order
    valid = sup[:, 0] < 1e37
    for o in range(8):
        sec = ps.mesh_box[o * nsup * g_rows:(o + 1) * nsup * g_rows]
        r0 = sec[0::g_rows]
        perm = r0[:, pp.IDX_LANE].astype(np.int64)
        assert sorted(perm) == list(range(nsup))
        np.testing.assert_array_equal(r0[:, 0:6], sup[perm])
        minpj = r0[:, pp.MINPJ_LANE]
        assert np.all(np.diff(minpj) >= 0)
        sgn = np.array([1.0 - 2.0 * ((o >> 2) & 1),
                        1.0 - 2.0 * ((o >> 1) & 1),
                        1.0 - 2.0 * (o & 1)], np.float32)
        corner = np.where(sgn > 0, sup[perm][:, 0:3], sup[perm][:, 3:6])
        want = np.where(valid[perm], corner @ sgn, 1e30)
        np.testing.assert_allclose(minpj, want.astype(np.float32),
                                   rtol=1e-6)


def test_median_split_order_is_aligned_permutation():
    """_median_split_order returns a permutation whose chunks never
    straddle a split and whose chunk AABBs are no looser than Morton's
    (SAH proxy) on a clustered random centroid set."""
    rng = np.random.RandomState(3)
    # two spatial blobs: the worst case for Morton-range straddling
    c = np.concatenate([rng.randn(700, 3), rng.randn(500, 3) + 8.0])
    units = (128, 16, 16)
    order = pp._median_split_order(c, units)
    assert sorted(order) == list(range(len(c)))

    def sah(o, chunk):
        cc = c[o]
        pad = (-len(cc)) % chunk
        cc = np.concatenate([cc, np.repeat(cc[-1:], pad, axis=0)])
        lo = cc.reshape(-1, chunk, 3).min(axis=1)
        hi = cc.reshape(-1, chunk, 3).max(axis=1)
        d = hi - lo
        return float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                      + d[:, 0] * d[:, 2]).sum())

    lo_all = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo_all, 1e-12)
    g = np.clip((c - lo_all) / ext * 1023.0, 0, 1023).astype(np.uint64)
    morton = np.argsort(pp._morton3(g[:, 0], g[:, 1], g[:, 2]),
                        kind="stable")
    assert sah(order, 16) < sah(morton, 16)


def test_median_cluster_order_matches_morton(monkeypatch):
    """RENE_CLUSTER_ORDER=median is a pure re-clustering: the interpret
    -mode march must produce the same image as the Morton default
    (closest-hit winners are order-independent up to exact-t ties)."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run_m = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    out_m = np.asarray(run_m(3, 4)["radiance"])
    monkeypatch.setenv("RENE_CLUSTER_ORDER", "median")
    bn2, cfg2 = build_device_scene(scene)
    run_k = pp.make_pallas_batch_fn(bn2, cfg2, interpret=True)
    out_k = np.asarray(run_k(3, 4)["radiance"])
    np.testing.assert_allclose(out_k, out_m, rtol=1e-5, atol=1e-6)


def test_pack_layout_and_finish():
    """Sample-in-tile packing (pack=4): every (pixel, slot) pair has a
    representative lane carrying that pixel, and finish() sums exactly
    `pack` slot representatives per pixel (lane outputs are per-sample
    sums, so the slot reduction is the film accumulation)."""
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, interpret=True, pack=4)
    assert run.spp_mult == 4
    w, h = cfg.film.xresolution, cfg.film.yresolution
    # packed blocks are 16x16 pixels: twice the tiles of the 32x32 grid
    base = pp.make_pallas_batch_fn(bn, cfg, interpret=True)
    assert base.spp_mult == 1
    assert run.n_tiles > base.n_tiles
    # synthetic lane outputs: value == the lane's pixel id
    lanepix = run.px_host + run.py_host * w
    import jax.numpy as jnp
    outs = [jnp.asarray(lanepix)] * 10
    out = run.finish(outs)
    np.testing.assert_allclose(np.asarray(out["radiance"][:, 0]),
                               np.arange(w * h, dtype=np.float32) * 4)


@pytest.mark.slow
def test_pack_matches_unpacked(monkeypatch):
    """pack=4 with n per-lane samples must statistically match pack=1
    with 4n samples (per-(pixel,slot) decorrelated streams; exact
    parity is impossible since the RNG/sobol keys differ by design)."""
    monkeypatch.setattr(pp, "CLUSTER", 16)
    scene = big_mesh_scene()
    bn, cfg = build_device_scene(scene)
    spp = 8
    o1 = pp.make_pallas_batch_fn(bn, cfg, interpret=True)(3, spp)
    o4 = pp.make_pallas_batch_fn(bn, cfg, interpret=True,
                                 pack=4)(3, spp // 4)
    a = np.asarray(o1["radiance"]) / spp
    b = np.asarray(o4["radiance"]) / spp
    # 8 spp of fully decorrelated streams: the frame mean fluctuates
    # ~5% (a full-suite run measured rel diff 0.054); the first-hit
    # AOV check below is the tight structural signal
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) < 0.15
    # first-hit AOVs differ only by camera jitter (measured 0.0096)
    n1 = np.asarray(o1["normal"]) / spp
    n4 = np.asarray(o4["normal"]) / spp
    assert np.abs(n1 - n4).mean() < 0.05
