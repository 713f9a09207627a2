"""Image loading: PFM (own parser), EXR (own minimal reader), LDR via PIL.

Parity with the reference (/root/reference/rene/src/scene/intermediate_scene.rs:631-677
and pfm_parser.rs): PFM binary Portable FloatMap with byte order from the
scale sign and bottom-up row order; EXR first RGBA layer; anything else is
decoded as LDR and inverse-gamma-corrected (sRGB piecewise curve) to linear,
alpha kept linear.

All loaders return an `Image`: float32 RGBA array of shape (H, W, 4), row 0 at
the *top* (matching the reference's in-memory layout where data[y*w+x] with
y=0 the first decoded row; PFM rows are flipped to top-down here exactly like
the reference writes `data[(y*width+x)]` iterating y from height-1 down).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


class Image:
    def __init__(self, data: np.ndarray):
        data = np.asarray(data, dtype=np.float32)
        assert data.ndim == 3 and data.shape[2] == 4
        self.data = data

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]


def inverse_gamma_correct(v: np.ndarray) -> np.ndarray:
    """sRGB decode, reference intermediate_scene.rs:616-622."""
    v = np.asarray(v, dtype=np.float32)
    return np.where(v <= 0.04045, v / 12.92,
                    ((v + 0.055) / 1.055) ** 2.4).astype(np.float32)


def gamma_correct(v: np.ndarray) -> np.ndarray:
    """sRGB encode (pbrt gamma 2.2 curve), reference main.rs:1766-1774."""
    v = np.asarray(v, dtype=np.float32)
    return np.where(v <= 0.0031308, 12.92 * v,
                    1.055 * np.maximum(v, 1e-12) ** (1.0 / 2.4) - 0.055
                    ).astype(np.float32)


# ---------------------------------------------------------------------------
# PFM
# ---------------------------------------------------------------------------

def load_pfm(path: str) -> Image:
    with open(path, "rb") as f:
        raw = f.read()
    # header: "PF\n<w> <h>\n<scale>\n" (reference pfm_parser.rs:10-17)
    if not raw.startswith(b"PF"):
        raise ValueError("not a color PFM")
    parts = raw.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PFM header")
    dims = parts[1].split()
    w, h = int(dims[0]), int(dims[1])
    scale = float(parts[2])
    body = parts[3]
    dtype = ">f4" if scale > 0 else "<f4"
    rgb = np.frombuffer(body, dtype=dtype, count=w * h * 3).reshape(h, w, 3)
    # PFM stores rows bottom-up; flip to top-down.
    rgb = rgb[::-1].astype(np.float32)
    rgba = np.concatenate([rgb, np.ones((h, w, 1), np.float32)], axis=-1)
    return Image(rgba)


# ---------------------------------------------------------------------------
# Minimal EXR reader (scanline, NONE/ZIP/ZIPS, half/float/uint channels)
# ---------------------------------------------------------------------------

def _read_cstr(buf, off):
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("ascii"), end + 1


def _exr_unzip(data: bytes, uncompressed_size: int) -> bytes:
    raw = zlib.decompress(data)
    if len(raw) != uncompressed_size:
        raise ValueError("bad EXR zip block size")
    # undo delta predictor then de-interleave two halves
    d = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    d = ((np.cumsum(d - 128) + 128) % 256).astype(np.uint8)
    n = len(d)
    out = np.zeros(n, dtype=np.uint8)
    half = (n + 1) // 2
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return out.tobytes()


def load_exr(path: str) -> Image:
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"\x76\x2f\x31\x01":
        raise ValueError("not an EXR file")
    version = struct.unpack("<I", buf[4:8])[0]
    if version & 0x200:
        raise ValueError("tiled/multipart EXR unsupported")
    off = 8
    attrs = {}
    while buf[off] != 0:
        name, off = _read_cstr(buf, off)
        ty, off = _read_cstr(buf, off)
        size = struct.unpack("<I", buf[off:off + 4])[0]
        off += 4
        attrs[name] = (ty, buf[off:off + size])
        off += size
    off += 1  # header terminator

    # channels
    chans = []  # (name, pixel_type) pixel_type: 0=uint,1=half,2=float
    cdata = attrs["channels"][1]
    coff = 0
    while cdata[coff] != 0:
        cname, coff = _read_cstr(cdata, coff)
        ptype = struct.unpack("<i", cdata[coff:coff + 4])[0]
        coff += 16  # pixel type + pLinear+pad + xSampling + ySampling
        chans.append((cname, ptype))
    comp = attrs["compression"][1][0]
    dw = struct.unpack("<4i", attrs["dataWindow"][1])
    xmin, ymin, xmax, ymax = dw
    w, h = xmax - xmin + 1, ymax - ymin + 1
    if comp == 0:
        lines_per_block = 1
    elif comp in (2, 3):  # ZIPS, ZIP
        lines_per_block = 1 if comp == 2 else 16
    else:
        raise ValueError(f"EXR compression {comp} unsupported (NONE/ZIP only)")

    nblocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack(f"<{nblocks}Q", buf[off:off + 8 * nblocks])

    psize = {0: 4, 1: 2, 2: 4}
    dtypes = {0: "<u4", 1: "<f2", 2: "<f4"}
    bytes_per_line = sum(psize[pt] for _, pt in chans) * w

    planes = {name: np.zeros((h, w), np.float32) for name, _ in chans}
    for bi, boff in enumerate(offsets):
        y0 = struct.unpack("<i", buf[boff:boff + 4])[0] - ymin
        dsize = struct.unpack("<I", buf[boff + 4:boff + 8])[0]
        data = buf[boff + 8:boff + 8 + dsize]
        nlines = min(lines_per_block, h - y0)
        want = bytes_per_line * nlines
        if comp in (2, 3) and dsize < want:
            data = _exr_unzip(data, want)
        line_off = 0
        for ly in range(nlines):
            for cname, pt in chans:  # channels stored alphabetically per line
                cnt = w
                seg = data[line_off:line_off + psize[pt] * cnt]
                arr = np.frombuffer(seg, dtype=dtypes[pt]).astype(np.float32)
                planes[cname][y0 + ly] = arr
                line_off += psize[pt] * cnt

    def plane(n, default):
        return planes.get(n, np.full((h, w), default, np.float32))

    rgba = np.stack([plane("R", 0), plane("G", 0), plane("B", 0),
                     plane("A", 1)], axis=-1)
    return Image(rgba)


# ---------------------------------------------------------------------------
# Dispatch (reference load_image, intermediate_scene.rs:631-677)
# ---------------------------------------------------------------------------

def load_image(path: str) -> Image:
    lower = str(path).lower()
    if lower.endswith(".pfm"):
        return load_pfm(path)
    if lower.endswith(".exr"):
        return load_exr(path)
    from PIL import Image as PILImage
    img = PILImage.open(path).convert("RGBA")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    rgba = np.concatenate(
        [inverse_gamma_correct(arr[..., :3]), arr[..., 3:4]], axis=-1)
    return Image(rgba)
