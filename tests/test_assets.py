"""Asset loader tests: PLY, PFM, EXR, LDR, SPD, blackbody, subdivision."""
import io
import struct

import numpy as np
import pytest

from rene_tpu.scene.assets.images import (Image, gamma_correct,
                                          inverse_gamma_correct, load_exr,
                                          load_image, load_pfm)
from rene_tpu.scene.assets.ply import TriangleMesh, load_ply
from rene_tpu.scene.assets.spectrum import (load_spd, spd_samples_to_rgb,
                                            temperature_to_rgb)
from rene_tpu.scene.assets.subdivision import generate_normals, loop_subdivision


def write_binary_ply(path, with_normals=True, quad=False):
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    props = "property float x\nproperty float y\nproperty float z\n"
    ncols = 3
    if with_normals:
        props += ("property float nx\nproperty float ny\n"
                  "property float nz\n")
        verts = np.concatenate(
            [verts, np.tile([0, 0, 1], (4, 1)).astype(np.float32)], axis=1)
        ncols = 6
    header = (f"ply\nformat binary_little_endian 1.0\n"
              f"element vertex 4\n{props}"
              f"element face {1 if quad else 2}\n"
              f"property list uchar int vertex_indices\nend_header\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        if quad:
            f.write(struct.pack("<B4i", 4, 0, 1, 2, 3))
        else:
            f.write(struct.pack("<B3i", 3, 0, 1, 2))
            f.write(struct.pack("<B3i", 3, 0, 2, 3))


def test_ply_binary_tri(tmp_path):
    p = tmp_path / "tri.ply"
    write_binary_ply(str(p))
    mesh = load_ply(str(p))
    assert mesh.num_triangles == 2
    np.testing.assert_allclose(mesh.normals, np.tile([0, 0, 1], (4, 1)))


def test_ply_quad_split(tmp_path):
    p = tmp_path / "quad.ply"
    write_binary_ply(str(p), quad=True)
    mesh = load_ply(str(p))
    assert mesh.num_triangles == 2
    np.testing.assert_array_equal(mesh.indices, [0, 1, 2, 0, 2, 3])


def test_ply_real_asset(sample_scenes):
    mesh = load_ply(str(sample_scenes / "teapot/models/Mesh001.ply"))
    assert mesh.num_triangles == 78176
    assert np.abs(np.linalg.norm(mesh.normals, axis=1) - 1.0).max() < 1e-3


def test_pfm_roundtrip(tmp_path):
    w, h = 4, 3
    data = np.arange(w * h * 3, dtype="<f4").reshape(h, w, 3)
    p = tmp_path / "img.pfm"
    with open(p, "wb") as f:
        f.write(f"PF\n{w} {h}\n-1.0\n".encode())
        # PFM rows are bottom-up
        f.write(data[::-1].tobytes())
    img = load_pfm(str(p))
    assert img.width == w and img.height == h
    np.testing.assert_allclose(img.data[..., :3], data)


def _write_zip_exr(path, plane_r, plane_g, plane_b):
    """Minimal single-part scanline EXR writer (ZIP, float32), test-only."""
    import zlib
    h, w = plane_r.shape

    def attr(name, ty, data):
        return (name.encode() + b"\x00" + ty.encode() + b"\x00"
                + struct.pack("<I", len(data)) + data)

    def chan(name):
        return (name.encode() + b"\x00" + struct.pack("<i", 2)  # FLOAT
                + b"\x00\x00\x00\x00" + struct.pack("<ii", 1, 1))

    header = b"\x76\x2f\x31\x01" + struct.pack("<I", 2)
    header += attr("channels", "chlist", chan("B") + chan("G") + chan("R")
                   + b"\x00")
    header += attr("compression", "compression", b"\x03")  # ZIP (16 lines)
    header += attr("dataWindow", "box2i",
                   struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i",
                   struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    blocks = []
    for y0 in range(0, h, 16):
        nl = min(16, h - y0)
        raw = b""
        for y in range(y0, y0 + nl):
            # channels per scanline, alphabetical: B, G, R
            raw += plane_b[y].astype("<f4").tobytes()
            raw += plane_g[y].astype("<f4").tobytes()
            raw += plane_r[y].astype("<f4").tobytes()
        # EXR zip: interleave halves + delta predictor, then deflate
        arr = np.frombuffer(raw, np.uint8)
        half = (len(arr) + 1) // 2
        inter = np.zeros_like(arr)
        inter[:half] = arr[0::2]
        inter[half:] = arr[1::2]
        d = inter.astype(np.int16)
        d[1:] = ((d[1:] - d[:-1].astype(np.int16)) + 128) % 256
        comp = zlib.compress(d.astype(np.uint8).tobytes())
        if len(comp) >= len(raw):
            comp = raw
        blocks.append((y0, comp))

    offsets_pos = len(header) + 8 * len(blocks)
    out = bytearray(header)
    off = offsets_pos
    for y0, comp in blocks:
        out += struct.pack("<Q", off)
        off += 8 + len(comp)
    for y0, comp in blocks:
        out += struct.pack("<iI", y0, len(comp)) + comp
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_exr_zip_roundtrip(tmp_path):
    h, w = 20, 33
    r = np.random.default_rng(0)
    pr = r.uniform(0, 4, (h, w)).astype(np.float32)
    pg = r.uniform(0, 4, (h, w)).astype(np.float32)
    pb = r.uniform(0, 4, (h, w)).astype(np.float32)
    p = tmp_path / "t.exr"
    _write_zip_exr(str(p), pr, pg, pb)
    img = load_exr(str(p))
    assert img.width == w and img.height == h
    np.testing.assert_allclose(img.data[..., 0], pr, rtol=1e-6)
    np.testing.assert_allclose(img.data[..., 1], pg, rtol=1e-6)
    np.testing.assert_allclose(img.data[..., 2], pb, rtol=1e-6)


def test_ldr_png_linearized(tmp_path):
    from PIL import Image as PILImage
    arr = np.zeros((2, 2, 3), np.uint8)
    arr[0, 0] = [255, 128, 0]
    p = tmp_path / "t.png"
    PILImage.fromarray(arr).save(p)
    img = load_image(str(p))
    assert img.data[0, 0, 0] == pytest.approx(1.0, abs=1e-4)
    assert img.data[0, 0, 1] == pytest.approx(
        inverse_gamma_correct(128 / 255.0), abs=1e-4)


def test_gamma_roundtrip():
    v = np.linspace(0, 1, 64)
    np.testing.assert_allclose(inverse_gamma_correct(gamma_correct(v)), v,
                               atol=1e-5)


def test_spd_flat_spectrum_is_white(tmp_path):
    p = tmp_path / "flat.spd"
    with open(p, "w") as f:
        for lam in range(300, 900, 10):
            f.write(f"{lam} 1.0\n")
    rgb = load_spd(str(p))
    # equal-energy spectrum -> near-white (E illuminant)
    assert np.all(rgb > 0.7) and np.all(rgb < 1.3)
    assert abs(rgb[0] - rgb[1]) < 0.3


def test_blackbody_colors():
    hot = temperature_to_rgb(10000.0)   # bluish
    warm = temperature_to_rgb(2500.0)   # reddish
    assert hot[2] / max(hot[0], 1e-6) > 1.0
    assert warm[0] / max(warm[2], 1e-6) > 2.0


def test_loop_subdivision_counts():
    mesh = TriangleMesh(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.zeros((3, 3), np.float32), np.zeros((3, 2), np.float32),
        np.array([0, 1, 2], np.uint32))
    out = loop_subdivision(mesh, 2)
    assert out.num_triangles == 16  # 4^2
    assert np.abs(np.linalg.norm(out.normals, axis=1) - 1.0).max() < 1e-4


def test_loop_subdivision_smooths_towards_limit():
    # an octahedron subdivided twice shrinks towards a sphere-ish surface
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float32)
    idx = np.array([0, 2, 4, 2, 1, 4, 1, 3, 4, 3, 0, 4,
                    2, 0, 5, 1, 2, 5, 3, 1, 5, 0, 3, 5], np.uint32)
    mesh = TriangleMesh(v, np.zeros((6, 3), np.float32),
                        np.zeros((6, 2), np.float32), idx)
    out = loop_subdivision(mesh, 2)
    r = np.linalg.norm(out.positions, axis=1)
    assert r.max() < 1.0  # strictly inside the control hull
    assert r.std() < 0.08  # nearly spherical


@pytest.mark.slow
def test_exr_piz_golden(sample_scenes):
    """PIZ decode of the shipped Tungsten EXR golden: the cornell emitter
    pixels must decode to the scene's exact L=[17,12,4], and the image must
    correlate with the PNG golden (a different pass of the same frame)."""
    from rene_tpu.scene.assets.images import load_exr
    img = load_exr(str(sample_scenes / "cornell-box/TungstenRender.exr"))
    exr = img.data[..., :3]
    assert exr.shape == (1024, 1024, 3)
    np.testing.assert_allclose(
        [exr[..., c].max() for c in range(3)], [17.0, 12.0, 4.0])
    from PIL import Image as PILImage
    png = np.asarray(PILImage.open(
        str(sample_scenes / "cornell-box/TungstenRender.png")).convert(
        "RGB"), np.float32) / 255.0
    x = np.clip(exr, 0, 1)
    enc = np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)
    corr = np.corrcoef(enc.ravel(), png.ravel())[0, 1]
    assert corr > 0.99
