"""Pallas TPU megakernel path tracer — the speed-of-light fast path.

Motivation (measured on this TPU runtime): the XLA wavefront pipeline
executes as hundreds of *unfused* HLO instructions per bounce, each paying an
HBM round-trip (~8 Mrays/s regardless of lane count), while a Pallas kernel
runs the same arithmetic fused in VMEM at full VPU rate. So the entire
sample loop — camera, intersection, shading, NEE/MIS, Russian roulette,
path regeneration — is compiled as ONE Pallas kernel per ray tile.

Design:
* **Scene-specialized JIT**: triangle/sphere records, material parameters and
  light constants are baked into the kernel as immediates (the reference
  uploads them to descriptor buffers; we embed them in the program). One
  compile per scene, persisted in the JAX compilation cache.
* **Unrolled brute-force intersection**: per triangle, the Plücker side
  tests + plane t are ~25 VPU ops on the (8,128)-tiled ray block; shading
  attributes accumulate through `where` selects in the same loop. Eligible
  scenes are small (<= ~512 triangles: cornell-box, veach-mis, sphere/cube);
  big meshes fall back to the XLA+BVH path.
* **Hardware PRNG**: pltpu.prng_random_bits + mantissa bitcast — integer
  PCG in the XLA path costs ~0.15 ms per draw, the on-chip generator is
  ~free. Streams are seeded per (host seed, grid tile).
* **Path regeneration** identical to integrators/path.py: each lane owns one
  pixel and streams `num_samples` samples back-to-back.

Eligibility (`pallas_eligible`): path or volpath integrator, all 8
reference materials (the Kd slot of matte/substrate/plastic/uber may be
checker/imagemap/scale), <=MAX_SPHERES spheres, <=MAX_LIGHTS distant
lights, solid or image-mapped background. Scenes up
to MAX_TRIS triangles are fully baked as immediates; bigger scenes (e.g.
teapot/dragon) keep emissive/per-hit-uv tris as immediates and march the
rest through a VMEM cluster table gated by a compact box table; meshes
past HBM_MIN_TRIS (up to MESH_MAX_TRIS = 2^22) stream cluster groups
from HBM by DMA. Everything else uses the XLA path — same math, same
estimators.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import math
import os
from typing import List, Optional

import numpy as np

from ..scene import types as T
from ..scene.device import RenderConfig

log = logging.getLogger("rene_tpu.pallas")

MAX_TRIS = 512
MAX_SPHERES = 64       # unrolled per-sphere tests; baked immediates
MAX_LIGHTS = 16        # unrolled distant-light NEE loops
# Sphere TABLE: scenes beyond MAX_SPHERES keep their non-emissive
# uniform-scale solid-material spheres in a VMEM table of 128-sphere
# Morton-ordered blocks (8 rows: cx cy cz r matid imed emed box) marched
# like a mini cluster table — one AABB slab test gates each block's
# unrolled 128 analytic tests. The reference needs no cap at all: one
# shared unit-sphere BLAS serves any instance count
# (rene/src/main.rs:2437-2590); this is the TPU equivalent, and it
# lifts the 250x XLA-fallback cliff a 100-sphere scene used to hit.
# Emissive / textured / non-uniformly-scaled spheres stay immediates
# (their sampling, uv and W2O^T-normal paths need per-sphere data).
SPH_BLOCK = 128
SPH_ROWS = 8
SPH_ROW_BOX = 7        # block AABB at lanes 0..5 of this row
SPH_TABLE_MAX = 1 << 15
# Distant-light TABLE: scenes past MAX_LIGHTS keep every distant light
# in a VMEM table (one light per ROW: dir xyz + color rgb at lanes
# 0..5) folded by a fori_loop with dynamic row slices — the same
# probed-legal pattern the instance tables use. The reference has no
# light cap either (lights are a storage buffer, main.rs:2965-3299).
LIGHT_TABLE_MAX = 1024
TILE_SUB = 64          # ray tile = (TILE_SUB, 128) lanes
TILE = TILE_SUB * 128
MESH_TILE_SUB = 8      # smaller tiles for cluster scenes: tighter ray beams
RR_START = 12
TMIN = 1e-3

# -- clustered big-mesh path ------------------------------------------------
# Scenes over MAX_TRIS triangles can't be baked as immediates. Instead the
# non-emissive mesh lives in VMEM as one transposed f32 table of
# (MESH_ROWS, n_clusters*128): a cluster is 128 Morton-ordered triangles,
# marched by a fori_loop whose body slab-tests the cluster AABB and only
# runs the (statically unrolled) 128 Moller-Trumbore tests under a lax.cond
# when any lane's ray enters the box. Mosaic constraints that force this
# shape: no per-lane gathers, no dynamic scalar VMEM indexing (only dynamic
# *slices* of 128-lane blocks with static in-block reads).
CLUSTER = 128
MESH_MAX_TRIS = 1 << 22
# meshes whose cluster table exceeds the VMEM budget stream from HBM:
# the geometry stays in HBM (pl.ANY) and a compact VMEM box table (one
# 128-lane row per super group: super AABB in lanes 0-5, member
# sub-block AABBs after) gates a per-group DMA into a VMEM scratch
# buffer. The reference's size-unbounded BLAS (main.rs:2592-2737)
# equivalent.
HBM_MIN_TRIS = 1 << 17
# table rows: v0(3), e1(3), e2(3), matid(1), n0(3), dn1(3), dn2(3),
# sub-cluster AABBs (ROW_BOX lanes s*6..s*6+5 for sub-block s; a cluster
# is tested/skipped in SUB_TRIS-sized blocks so divergent bounce rays
# don't force the whole 128-tri unroll). The march itself reads every
# AABB from the compact box table (below); ROW_BOX is kept as the
# host-side source the table is packed from.
ROW_V0, ROW_E1, ROW_E2, ROW_MID = 0, 3, 6, 9
ROW_N0, ROW_D1, ROW_D2, ROW_BOX = 10, 13, 16, 19
ROW_UV0, ROW_DUV1, ROW_DUV2 = 20, 22, 24  # (u,v) pairs, only present
                                          # when a mesh material needs
                                          # per-hit uv (mesh_rows == 32)
MESH_ROWS = 24  # 20 used rows padded to the f32 sublane tile (8) so the
                # HBM DMA's row slice stays tile-aligned; 32 with uv rows
MESH_ROWS_UV = 32
SUB_TRIS = 64   # measured best (32 was ~-5% @320x180 and -16% @720p)
_PROFILE_SKIP_MT = False  # profiling knob: march boxes but skip the MT
                          # unrolls (isolates the box-sweep floor)
MEMBER_FORI = True  # fori over a group's member clusters: ONE MT unroll
                    # in the program instead of SUPER*N_SUB (unrolled box
                    # tests collapse to scalar flags selected by the
                    # traced member index). Measured: volpath+cluster
                    # compile 1024s -> 62s, dragon 0.017 -> 0.015 s/spp,
                    # teapot 0.152 -> 0.165 (the one small loss);
                    # bit-identical images either way.
SUB_GATE = os.environ.get("RENE_SUB_GATE", "0") == "1"
# Per-sub-block gating INSIDE the member fori: the r4a E7 skip_mt A/B
# proved dragon's marginal cost is ~100% MT unrolls, and under
# MEMBER_FORI an entered member runs MT on the whole 128-tri cluster —
# the SUB_TRIS sub-boxes only tighten the member-entry flag. SUB_GATE
# wraps each sub-block's MT unroll in its own lax.cond keyed on a
# scalar flag chain (select over the traced member index), restoring
# the non-MEMBER_FORI path's gating at N_SUB MT copies instead of
# SUPER*N_SUB. Flags are computed from the group-entry t_best/hf —
# stale but conservative (a skipped sub-box cannot contain a closer
# hit). Measured (tpu_session_r4f): WINS -5% for the wave engine's
# sorted coherent tiles (teapot @720p 0.582 -> 0.554, now the wave
# default via make_pallas_wave_fn sub_gate), LOSES +17% for the
# megakernel's wide bounce beams (dragon @720p 0.108 -> 0.126) — this
# module-level default stays off; _build_kernel snapshots the knob (or
# its sub_gate override) at build time.
# -- wavefront engine ray-state layout (see pallas_wave.py) -----------------
# One (W_NROWS, N) f32 array carries every in-flight ray; the host sorts
# lanes by direction-octant x origin-cell between k-bounce kernel launches
# so tiles re-enter the cluster march with coherent rays. Lanes own a
# pixel (px/py rows) and REGENERATE: on path termination a lane starts
# its pixel's next sample (mega-kernel occupancy) until `want` samples
# are done, then parks at DEAD_ORIGIN (outside every AABB — no box
# entries, no MT-unroll work) and sorts dead-last.
WROW_O, WROW_D, WROW_C, WROW_R = 0, 3, 6, 9    # origin, dir, throughput,
                                               # accumulated radiance
WROW_ALIVE, WROW_RAYS, WROW_LANE = 12, 13, 14
WROW_PX, WROW_PY, WROW_SMP, WROW_DEP = 15, 16, 17, 18
WROW_WANT = 19  # per-lane sample target (pixels split samples across
                # their lanes; a 1-target lane never regenerates)
WROW_KEY = 20   # next-launch sort key, computed IN-KERNEL at bounce
                # time (hit-cluster origin bin x new-direction octant;
                # see wave_bounce) and stored as a positive normal f32
                # whose float order == its int bit order, so the host
                # sort is a bare argsort of this row — no XLA key math
W_SORT_ROWS = 21  # rows the between-launch sorts permute ("slim"
                  # sorts): the AOV rows below are written only at each
                  # sample's bounce 0 — all in step 0 when the wave
                  # carries one sample per lane — so they stay in
                  # INITIAL lane order and the finish reads them
                  # through a static permutation instead of paying
                  # 6/30 of every sort's gather traffic
WROW_MED = 21   # volpath waves only: the lane's current medium index —
                # per-lane ray state that must follow the ray, placed
                # directly after the sort rows so the slim gather (SR=22
                # in volpath) and the DMA slice permutation both move it
W_SORT_PAD = 24  # row extent the DMA slice-permutation kernel copies:
                 # the 21 sort rows + med/dummy padding up to the f32
                 # sublane tile (8) x 3 — HBM DMA slices must be
                 # 8-row-aligned in the sublane dimension (probed; see
                 # CLAUDE.md landmines). Rows [W_SORT_ROWS+VOL, 24) are
                 # dummy zeros.
WROW_AN, WROW_AA = 24, 27                      # AOV normal / albedo
W_NROWS = 32    # 6 AOV rows + 2 dummy rows after W_SORT_PAD: the DMA
W_NROWS_VOL = 32  # permutation's AOV passthrough then moves one full
                  # 8-row sublane tile (rows 24-31) — no partial-tile
                  # vector stores anywhere in the 2D kernel
DEAD_ORIGIN = 1e30
# super-cluster level: SUPER consecutive clusters share one AABB. All
# boxes of a group live in ONE (1,128) row of the box table: super AABB
# at lanes 0-5, member sub-block AABBs at 6+(g*n_sub+s)*6. The march
# tests the super box first, so a skipped group costs one row load + one
# slab test — the per-trace floor is O(C/SUPER) row tests, and geometry
# blocks are only loaded (or DMA'd from HBM) for entered groups.
SUPER = 8

# Per-octant ordered marching: the box table carries 8 sections, one per
# direction octant, each listing the super groups front-to-back along
# that octant's direction (projection of the group center). The kernel
# picks the section from the tile's lane-(0,0) direction signs and reads
# the group's geometry index back from row 0 lane IDX_LANE (plain float
# value + scalar f32->i32 cast — probed in scripts/tpu_session_r3n.py).
# Camera-baked order is correct for primary rays only; octant order lets
# the per-lane t_best prune the march for BOUNCE beams too (the wave
# engine's sorted tiles are exactly such beams). Correctness-neutral up
# to exact-t ties, like the camera ordering it replaces.
OCT_ORDER = True
IDX_LANE = 126  # free in every _box_layout: row0 sub-boxes end at 125
# Early march termination: octant sections are sorted by each group's
# MIN corner projection onto the octant sign vector s (stored at row 0
# lane MINPJ_LANE), which is monotone along the section. Any hit in a
# group projects >= that minimum, and a lane's improving hit projects
# <= s.o + t_cap * (|dx|+|dy|+|dz|) (s.d <= L1(d), t >= tmin >= 0), so
# once the group minimum exceeds every live lane's bound the remaining
# sweep cannot improve any lane and the march while-loop exits.
# The 8 octant sections multiply the VMEM-resident box table by 8; cap
# the oct layout so multi-million-tri HBM-streamed meshes keep fitting
# (they fall back to the single camera-ordered section): 16 MB covers
# n_super <= 2048 at g_rows=2 (~2M tris at CLUSTER=128).
# ceiling for the 8-section octant-ordered box table. Must leave scoped
# VMEM headroom for the kernel's other scratch: 16<<20 admitted a
# 16.76 MB table (1.047M tris, ST=16) that passed this gate by 16 KB
# and then OOM'd Mosaic's 16 MB scoped-vmem limit by 152 KB (r4q2 A2).
OCT_TABLE_MAX_BYTES = 14 << 20
OCT_BREAK = False       # closest-hit early-break (opt-in, see below)
OCT_BREAK_ANY = False   # any-hit (shadow) early-break (opt-in)
OCT_BREAK_VMEM = False  # apply the breaks to VMEM-resident tables too
BREAK_EVERY = 1         # evaluate the bound every N groups (1 = each)
MINPJ_LANE = 127
# Default policy: OFF — measured everywhere at-or-worse
# (tpu_session_r3s/r3t/r3v/r3x). VMEM corpus: teapot wave @720p 0.742
# no-break vs 0.783-0.855 across closest-only / closest+any /
# any-only / bound-every-4 s/spp; dragon deltas (0.014-0.016) inside
# the chip's +-10% run noise. HBM streaming (262k-tri bigmesh forced
# into hbm_mode): 0.143 with vs 0.137 without — the super-group enter
# tests already gate the DMAs, so the break only saves residual row
# sweeps while paying a per-group scalar reduce and a while-loop the
# scheduler pipelines worse than fori. Machinery kept behind the
# flags (with interpret parity coverage) for bigger/deeper scenes
# where the sweep-to-work ratio may differ.


def _sub_split(cluster: int, sub_tris: int = 0):
    """(n_sub, sub) block split of a cluster width (tests shrink CLUSTER).

    ROW_BOX carries n_sub*6 sub-box lanes plus 6 super lanes inside the
    cluster's own `cluster` lanes, so n_sub is clamped to fit (SUB_TRIS=4
    at CLUSTER=64 would need 102 lanes and previously crashed the packer).
    `sub_tris` overrides the module knob (packed megakernels default to
    16 — the r4g/r4j sweeps' winner at packed beam tightness — while 64
    stays the unpacked default; both must see the SAME value in the
    table packer and the kernel builder)."""
    n_sub = max(1, cluster // (sub_tris or SUB_TRIS))
    while n_sub > 1 and n_sub * 6 + 6 > cluster:
        n_sub //= 2
    return n_sub, cluster // n_sub


def _box_layout(n_sub):
    """(rows_per_group, rowlane) of the box table: row 0 of each group
    holds the super AABB at lanes 0-5 followed by sub-boxes; overflow
    sub-boxes continue on subsequent rows from lane 0."""
    per_row0 = (128 - 6) // 6
    per_row = 128 // 6
    total = SUPER * n_sub
    rows = 1 + max(0, -(-(total - per_row0) // per_row))

    def rowlane(j):
        if j < per_row0:
            return 0, 6 + j * 6
        j -= per_row0
        return 1 + j // per_row, (j % per_row) * 6
    return rows, rowlane


# ---------------------------------------------------------------------------
# Scene record packing (host side)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PallasScene:
    """Per-primitive shading records as python-float constants."""
    tris: List[dict]
    spheres: List[dict]
    emit_objects: List[dict]
    lights: List[dict]
    background: tuple
    cam_proj_inv: np.ndarray
    cam_to_world: np.ndarray
    width: int
    height: int
    max_depth: int
    num_emit: int
    filter_radius: float = 0.0  # tent pixel filter (0 = box jitter)
    sampler: str = "independent"  # "sobol" = padded LD draws
    # clustered big-mesh tables (None / 0 when all tris fit as immediates)
    mesh_geom: Optional[np.ndarray] = None   # (MESH_ROWS, n_clusters*128)
    mesh_mats: Optional[List[dict]] = None   # matid -> material record
    n_clusters: int = 0
    # HBM streaming mode: geometry in HBM, per-group box table in VMEM
    mesh_hbm: bool = False
    # (pad8(rows), 128) box table. Non-oct: n_super*g_rows rows. Oct
    # (mesh_oct): 8 sections of n_super*g_rows rows, one per direction
    # octant, each front-to-back by min corner projection, with the
    # group's geometry index / min projection at row-0 lanes
    # IDX_LANE/MINPJ_LANE.
    mesh_box: Optional[np.ndarray] = None
    mesh_root: Optional[tuple] = None        # ((lo3), (hi3)) world AABB
    mesh_oct: bool = False                   # box table has 8 octant sections
    # shared instanced BLAS tables (object space, one per shared blas):
    # dicts of geom/box/n_clusters/inst_rows/n_inst (_pack_inst_mesh)
    inst_meshes: Optional[List[dict]] = None
    # volpath: integrator tag + homogeneous-medium records (index 0 = vacuum)
    integrator: str = "path"
    media: Optional[List[dict]] = None
    # imagemap textures: channel-planar VMEM atlas (3*rows, 128) f32 and
    # the background image descriptor (base_row, width, height) or None
    img_table: Optional[np.ndarray] = None
    img_rows: int = 0
    bg_img: Optional[tuple] = None
    bg_matrix: Optional[np.ndarray] = None
    # infinite-light importance sampling (config.env_nee): one VMEM
    # table of (ENV_GH ccdf rows, ENV_GH pdf rows, 1 mcdf row, pad to a
    # sublane-tile multiple) x 128 lanes — see device.py ENV_* buffers
    env_tab: Optional[np.ndarray] = None
    bg_matrix_inv: Optional[np.ndarray] = None
    # parallelogram-fused immediate quads (_fuse_parallelograms): each
    # replaces TWO flat non-emissive coplanar tris with one plane test +
    # two dual-basis dots — the brute unroll is the measured 67-81%
    # kernel floor (VALIDATION.md r4u/r4u2), so architectural quad
    # geometry is re-fused at pack time
    quads: List[dict] = dataclasses.field(default_factory=list)
    # invariant attribute-select elision (_LazyAttr). Read from
    # RENE_ATTR_ELIDE exactly ONCE (at pack time) and threaded here so
    # pack-time quad sorting and build-time elision can never disagree
    attr_elide: bool = False
    # img_table layout: True = RGB9E5 u32-packed (rows,128), False =
    # 3-channel-planar (3*rows,128). Decided at pack time (RENE_IMG_PACK)
    # and threaded here so pack and build can never disagree.
    img_packed: bool = False
    # sphere table (module constants SPH_*): (SPH_ROWS, n_blocks*128)
    # f32 + per-slot material records, for scenes past MAX_SPHERES
    sph_table: Optional[np.ndarray] = None
    sph_mats: Optional[List[dict]] = None
    n_sph_blocks: int = 0
    # distant-light table for scenes past MAX_LIGHTS (one light/row)
    light_table: Optional[np.ndarray] = None
    # checker background: (uscale, vscale, rgb_even, rgb_odd) evaluated
    # inline in the miss shader from the same bg_matrix spherical uv the
    # imagemap background uses (lifts the bg in {solid, imagemap} cap)
    bg_checker: Optional[tuple] = None


def _emissive_tri_mask(buffers_np) -> np.ndarray:
    """(T,) bool: triangle belongs to an area light."""
    al = buffers_np["inst_area_light"][buffers_np["tri_inst"]]
    return buffers_np["area_type"][al] != T.AREA_NULL


OK_MATS = {T.MAT_NONE, T.MAT_MATTE, T.MAT_METAL, T.MAT_MIRROR,
           T.MAT_GLASS, T.MAT_SUBSTRATE, T.MAT_UBER, T.MAT_PLASTIC}

# -- imagemap textures in the kernel -----------------------------------------
# Mosaic has no per-lane arbitrary gather; the one legal form is a
# same-shape gather along the LANE dim (take_along_axis, axis=1). Images
# therefore live in VMEM as a channel-planar (3*rows, 128) table and a
# fetch is a fori_loop over 8-row pages: any-lane page skip, then per page
# a static row broadcast + lane gather + row-match select (see
# _build_kernel.fetch_image).
IMG_PAGE = 8
MAX_IMG_TEXELS = 1 << 18          # f32 x3 = 3 MB VMEM
MAX_IMG_TEXELS_CLUSTER = 1 << 16  # tighter when the mesh table coexists


def _tex_kernel_desc(buffers_np, ti: int):
    """Kernel-representable albedo-slot texture descriptor:
    ("solid", rgb) | ("checker", us, vs, rgb_even, rgb_odd) |
    ("image", img_idx, base_rgb) | None when unsupported
    (texture.rs one-level recursion: Scale folds its solid factor into
    base_rgb; Checker requires solid sub-textures)."""
    tt = int(buffers_np["tex_type"][ti])

    def srgb(s):
        return tuple(float(x) for x in buffers_np["tex_v0"][s, :3])

    if tt == T.TEX_SOLID:
        return ("solid", srgb(ti))
    if tt == T.TEX_IMAGEMAP:
        return ("image", int(buffers_np["tex_u0"][ti, 0]), (1.0, 1.0, 1.0))
    subs = [int(buffers_np["tex_u0"][ti, s]) for s in (0, 1)]
    kinds = [int(buffers_np["tex_type"][s]) for s in subs]
    if tt == T.TEX_CHECKER:
        if all(k == T.TEX_SOLID for k in kinds):
            tv = buffers_np["tex_v0"][ti]
            return ("checker", float(tv[0]), float(tv[1]),
                    srgb(subs[0]), srgb(subs[1]))
        return None
    if tt == T.TEX_SCALE:
        imgs = [s for s, k in zip(subs, kinds) if k == T.TEX_IMAGEMAP]
        solids = [s for s, k in zip(subs, kinds) if k == T.TEX_SOLID]
        if len(imgs) + len(solids) != 2 or len(imgs) > 1:
            return None
        base = (1.0, 1.0, 1.0)
        for s in solids:
            c = srgb(s)
            base = tuple(base[i] * c[i] for i in range(3))
        if imgs:
            return ("image", int(buffers_np["tex_u0"][imgs[0], 0]), base)
        return ("solid", base)
    return None


# materials whose Kd (slot 0, the diffuse component feeding the shared
# albedo attributes) may be any kernel texture descriptor (legacy name;
# superseded by _SLOT_CLASSES but kept for the record docs)
KD_TEX_MATS = {T.MAT_MATTE, T.MAT_SUBSTRATE, T.MAT_PLASTIC, T.MAT_UBER}

# ANY-SLOT kernel textures: payload slot -> semantic class per material
# (texture.rs:176-211 sampled from every material.rs per-slot color()
# call). Classes map onto kernel attr rows: kd -> ab*, ks -> k*,
# ru/rv -> ax/ay (rp = plastic's single roughness driving both), op ->
# uber opacity (op*, and the kr2/kt2 products), kr/kt -> uber Kr/Kt.
# Metal eta/k (slots 0/1) stay solid-only: per-hit conductor constants
# buy nothing for the shipped corpus and cost 6 more attr rows.
_SLOT_CLASSES = {
    T.MAT_MATTE: {0: "kd"},
    T.MAT_MIRROR: {0: "kd"},
    T.MAT_SUBSTRATE: {0: "kd", 1: "ks", 2: "ru", 3: "rv"},
    T.MAT_METAL: {2: "ru", 3: "rv"},
    T.MAT_PLASTIC: {0: "kd", 1: "ks", 3: "rp"},
    T.MAT_UBER: {0: "kd", 1: "ks", 2: "kr", 3: "kt", 4: "op",
                 5: "ru", 6: "rv"},
}
# image-descriptor classes carried as attr rows (rp expands to ru+rv)
IMG_CLASSES = ("kd", "ks", "ru", "rv", "op", "kr", "kt")


def _mat_slot_descs(buffers_np, mat_idx: int):
    """{class: descriptor} for every NON-SOLID texture slot of a
    material, or None if any slot is non-representable."""
    mt = int(buffers_np["mat_type"][mat_idx])
    cls_map = _SLOT_CLASSES.get(mt, {})
    out = {}
    for slot, ti in enumerate(_mat_tex_indices(buffers_np, mat_idx)):
        if int(buffers_np["tex_type"][ti]) == T.TEX_SOLID:
            continue
        cls = cls_map.get(slot)
        if cls is None:
            return None
        desc = _tex_kernel_desc(buffers_np, ti)
        if desc is None:
            return None
        if cls == "op" and desc[0] == "image" \
                and tuple(desc[2]) != (1.0, 1.0, 1.0):
            return None  # op applies 1-v; a scale base has no fold
        out[cls] = desc
    return out


def _kernel_images(buffers_np, config: RenderConfig):
    """Image ids the kernel would fetch: the background env map plus
    every used material slot that resolves to an image descriptor."""
    used = set()
    bg_tex = int(buffers_np["background_texture"])
    bg_desc = _tex_kernel_desc(buffers_np, bg_tex)
    if bg_desc is not None and bg_desc[0] == "image":
        used.add(bg_desc[1])
    for m in set(buffers_np["inst_material"].tolist()):
        descs = _mat_slot_descs(buffers_np, int(m))
        for desc in (descs or {}).values():
            if desc[0] == "image":
                used.add(desc[1])
    return sorted(used)


def _image_rows(buffers_np, img_idx: int) -> int:
    texels = (int(buffers_np["img_width"][img_idx])
              * int(buffers_np["img_height"][img_idx]))
    return (texels + 127) // 128


def _mat_tex_indices(buffers_np, mat_idx: int):
    """Texture table indices a material row reads (payload slot map as in
    ops/bsdf._MAT_FETCHES)."""
    from ..ops.bsdf import _MAT_FETCHES
    mt = int(buffers_np["mat_type"][mat_idx])
    u0 = buffers_np["mat_u0"][mat_idx]
    u1 = buffers_np["mat_u1"][mat_idx]
    u1_slot = {4: 0, 5: 2, 6: 3}
    return [int(u0[s]) if s < 4 else int(u1[u1_slot[s]])
            for s in _MAT_FETCHES.get(mt, ())]


def _mat_solid_only(buffers_np, mat_idx: int) -> bool:
    return all(int(buffers_np["tex_type"][t]) == T.TEX_SOLID
               for t in _mat_tex_indices(buffers_np, mat_idx))


def _mat_kernel_ok(buffers_np, mat_idx: int) -> bool:
    """Material representable in the megakernel: a supported type where
    every non-solid texture slot has a kernel descriptor (checker with
    solid subs, imagemap, scale) in a class _SLOT_CLASSES supports —
    Kd, Ks, roughness, opacity, Kr/Kt — evaluated per hit from
    interpolated/spherical uv (texture.rs:176-211 across material.rs's
    per-slot fetches)."""
    if int(buffers_np["mat_type"][mat_idx]) not in OK_MATS:
        return False
    return _mat_slot_descs(buffers_np, mat_idx) is not None


def pallas_eligible(buffers_np, config: RenderConfig) -> bool:
    if config.integrator not in ("path", "volpath"):
        return False
    if config.num_spheres > MAX_SPHERES:
        # sphere-table split (see _pack_sphere_table): non-emissive
        # uniform-scale solid-material spheres go to the VMEM table,
        # the rest must fit the immediate budget
        n_imm = n_tbl = 0
        for s in range(config.num_spheres):
            inst = int(buffers_np["sph_inst"][s])
            al = int(buffers_np["inst_area_light"][inst])
            emissive = int(buffers_np["area_type"][al]) != T.AREA_NULL
            ok, _, _ = _sph_uniform(buffers_np["sph_o2w"][s])
            if (ok and not emissive and _mat_solid_only(
                    buffers_np, int(buffers_np["inst_material"][inst]))):
                n_tbl += 1
            else:
                n_imm += 1
        if n_imm > MAX_SPHERES or n_tbl > SPH_TABLE_MAX:
            return False
    if config.num_lights > LIGHT_TABLE_MAX:
        return False
    # miss shader (lib.rs:120-139) = texture(background_matrix*dir) *
    # background_color: a solid texture folds into a constant, an
    # imagemap is fetched from the VMEM atlas, a checker (solid subs)
    # evaluates inline from the miss uv, a scale folds; only
    # non-representable descriptors fall back to XLA
    bg_tex = int(buffers_np["background_texture"])
    if _tex_kernel_desc(buffers_np, bg_tex) is None:
        return False
    # VMEM budget for the image atlas (coexists with the cluster table;
    # HBM-streamed meshes leave VMEM free for the full budget). The cap
    # is keyed off the NON-IMMEDIATE triangle count — the same quantity
    # pack_scene's mesh_hbm switch uses — so a scene whose cluster table
    # is VMEM-resident never gets the full image budget.
    imgs = _kernel_images(buffers_np, config)
    texels = sum(_image_rows(buffers_np, i) for i in imgs) * 128
    n_mesh = n_shared_tris = 0
    if config.num_triangles > MAX_TRIS:
        mesh_idx = np.nonzero(
            ~_immediate_tri_mask(buffers_np)[:config.num_triangles])[0]
        rest_idx, shared = _shared_split(buffers_np, mesh_idx)
        n_mesh = int(rest_idx.size)
        n_shared_tris = sum(
            int(buffers_np["inst_prim_count"][insts[0]])
            for _, insts in shared)
    cap = (MAX_IMG_TEXELS_CLUSTER
           if (0 < n_mesh <= HBM_MIN_TRIS) or n_shared_tris
           else MAX_IMG_TEXELS)
    if texels > cap:
        return False
    n_mats = buffers_np["mat_type"].shape[0]
    kernel_ok = [_mat_kernel_ok(buffers_np, m) for m in range(n_mats)]
    used = set(buffers_np["inst_material"].tolist())
    if not all(kernel_ok[m] for m in used):
        return False
    # spheres compute spherical uv in the kernel (lib.rs:874-880), so the
    # same material set as triangles qualifies (solid + matte checker Kd)
    if config.num_triangles > MAX_TRIS:
        # clustered path: emissive or small-textured tris stay
        # immediates; shared-blas instances march one object-space
        # table each; the rest go to the merged world-space table
        if n_mesh > MESH_MAX_TRIS:
            return False
        if int(_immediate_tri_mask(buffers_np).sum()) > MAX_TRIS:
            return False
    return True


def _immediate_tri_mask(buffers_np) -> np.ndarray:
    """(T,) bool: tris that stay baked immediates when the scene uses
    the cluster table. Emissive tris always do. Tris whose material
    needs per-hit uv (checker/imagemap Kd) stay immediates too while
    they fit under MAX_TRIS — the immediates path is faster and keeps
    the mesh table at 24 rows; only when they don't fit do they drop
    into the cluster table, which then carries uv rows (32-row mode)."""
    em = _emissive_tri_mask(buffers_np)
    n_mats = buffers_np["mat_type"].shape[0]
    solid = np.array([_mat_solid_only(buffers_np, m)
                      for m in range(n_mats)], bool)
    tri_mat = buffers_np["inst_material"][buffers_np["tri_inst"]]
    with_tex = em | ~solid[tri_mat]
    if int(with_tex.sum()) <= MAX_TRIS:
        return with_tex
    return em


def _mesh_needs_uv(buffers_np, mesh_idx: np.ndarray) -> bool:
    """True when any cluster-table triangle's material carries a non-solid
    Kd descriptor (checker/imagemap/scale), i.e. the table needs uv rows."""
    mats = set(buffers_np["inst_material"][
        buffers_np["tri_inst"][mesh_idx]].tolist())
    return not all(_mat_solid_only(buffers_np, int(m)) for m in mats)


def _sphere_radius(m) -> float:
    """World radius of a unit sphere under o2w matrix `m` (4x4 nested
    list): mean column norm of the 3x3 part — rotation-safe, unlike the
    diagonal average (which diverges from the sampled cone for rotated
    instance matrices)."""
    return sum(math.sqrt(m[0][c] ** 2 + m[1][c] ** 2 + m[2][c] ** 2)
               for c in range(3)) / 3.0


def _remap_rough(r: float) -> float:
    """pbrt roughness->alpha polynomial (microfacet.rs)."""
    r = max(r, 1e-3)
    x = math.log(r)
    return (1.62142 + 0.819955 * x + 0.1734 * x * x
            + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)


def _mat_record(buffers_np, mat_idx: int) -> dict:
    """Resolve a material row + its textures into plain floats plus
    per-hit texture descriptors. `rec["texs"]` maps a slot class
    (IMG_CLASSES) to a ("checker", us, vs, rgb_e, rgb_o) or ("image",
    img_idx, base_rgb) descriptor; the rec's plain fields then hold the
    trace-time BASE value the fetch multiplies into (image) or a
    fallback (checker). Image descriptors are resolved to atlas rows in
    pack_scene once image base offsets are known."""
    mt = int(buffers_np["mat_type"][mat_idx])
    u0 = buffers_np["mat_u0"][mat_idx]
    u1 = buffers_np["mat_u1"][mat_idx]
    v0 = buffers_np["mat_v0"][mat_idx]
    descs = _mat_slot_descs(buffers_np, mat_idx) or {}
    texs = {}

    def tex_rgb(ti):
        return tuple(float(x) for x in buffers_np["tex_v0"][int(ti), :3])

    rec = {"mat_type": mt, "albedo": (0.0, 0.0, 0.0),
           "eta": (1.0, 1.0, 1.0), "k": (0.0, 0.0, 0.0),
           "alpha": (0.0, 0.0), "ir": 1.5, "texs": texs, "rrm": 0,
           "op": (0.0, 0.0, 0.0), "kr2": (0.0, 0.0, 0.0),
           "kt2": (0.0, 0.0, 0.0), "fscale": (1.0, 1.0, 1.0)}

    def slot_rgb(ti, cls):
        """Trace-time rgb base of a slot; registers its descriptor."""
        d = descs.get(cls)
        if d is None:
            return tex_rgb(ti)
        texs[cls] = d
        return d[3] if d[0] == "checker" else d[2]

    def slot_rough(ti, cls, remap):
        """Trace-time alpha of a roughness slot. Checker values are
        pre-remapped host-side; image roughness defers the remap to the
        kernel (rec["rrm"])."""
        d = descs.get(cls)
        if d is None:
            r = tex_rgb(ti)[0]
            return _remap_rough(r) if remap else r
        if d[0] == "checker":
            if remap:
                d = (d[0], d[1], d[2],
                     (_remap_rough(d[3][0]),) * 3,
                     (_remap_rough(d[4][0]),) * 3)
            texs[cls] = d
            return d[3][0]
        texs[cls] = d
        if remap:
            rec["rrm"] = 1
        return float(d[2][0])  # scale-fold base (plain imagemap: 1.0)

    if mt == T.MAT_MATTE:
        rec["albedo"] = slot_rgb(u0[0], "kd")
    elif mt == T.MAT_MIRROR:
        rec["albedo"] = slot_rgb(u0[0], "kd")
    elif mt == T.MAT_GLASS:
        rec["ir"] = float(v0[0])
    elif mt == T.MAT_SUBSTRATE:
        # FresnelBlend: Kd -> albedo (diffuse + AOV), Ks -> k slots
        # (material.rs:187-226)
        rec["albedo"] = slot_rgb(u0[0], "kd")
        rec["k"] = slot_rgb(u0[1], "ks")
        remap = bool(int(u1[0]))
        rec["alpha"] = (slot_rough(u0[2], "ru", remap),
                        slot_rough(u0[3], "rv", remap))
    elif mt == T.MAT_METAL:
        rec["eta"] = tex_rgb(u0[0])  # solid-only (_SLOT_CLASSES)
        rec["k"] = tex_rgb(u0[1])
        # mat_v0.xyz = conductor response scale (0 -> 1); overrides.py
        rec["fscale"] = tuple(1.0 if float(v) == 0.0 else float(v)
                              for v in v0[:3])
        remap = bool(int(u1[0]))
        rec["alpha"] = (slot_rough(u0[2], "ru", remap),
                        slot_rough(u0[3], "rv", remap))
        rec["albedo"] = rec["k"]  # AOV albedo (material.rs:309-317)
    elif mt == T.MAT_PLASTIC:
        # lambert(Kd) + microfacet(Ks, dielectric 1.5->1.0)
        # (material.rs:679-707); roughness texture u0.w, remap flag u1.z
        rec["albedo"] = slot_rgb(u0[0], "kd")
        rec["k"] = slot_rgb(u0[1], "ks")
        if "rp" in descs:  # one roughness slot drives both axes
            descs["ru"] = descs["rp"]
            descs["rv"] = descs["rp"]
        remap = bool(int(u1[2]))
        r_u = slot_rough(u0[3], "ru", remap)
        r_v = slot_rough(u0[3], "rv", remap)
        rec["alpha"] = (r_u, r_v)
    elif mt == T.MAT_UBER:
        # up to 5 conditional lobes (material.rs:578-630): opacity
        # spec-transmission, lambert(Kd), microfacet(Ks, dielectric
        # 1->eta), spec-reflection(op*Kr), spec-transmission(op*Kt, eta)
        rec["albedo"] = slot_rgb(u0[0], "kd")
        rec["k"] = slot_rgb(u0[1], "ks")
        kr = slot_rgb(u0[2], "kr")
        kt = slot_rgb(u0[3], "kt")
        op_desc = descs.get("op")
        if op_desc is None:
            op = tex_rgb(u1[0])
            rec["op"] = tuple(1.0 - c for c in op)  # transmission weight
            rec["kr2"] = tuple(op[i] * kr[i] for i in range(3))
            rec["kt2"] = tuple(op[i] * kt[i] for i in range(3))
            # fold solid op into textured Kr/Kt descriptors
            for cls in ("kr", "kt"):
                d = texs.get(cls)
                if d is None:
                    continue
                if d[0] == "checker":
                    texs[cls] = (d[0], d[1], d[2],
                                 tuple(op[i] * d[3][i] for i in range(3)),
                                 tuple(op[i] * d[4][i] for i in range(3)))
                else:
                    texs[cls] = (d[0], d[1],
                                 tuple(op[i] * d[2][i] for i in range(3)))
        else:
            # textured opacity: kr2/kt2 carry the OP-LESS products; the
            # per-hit op (checker inline / image fetch) multiplies them
            # and sets op = 1 - v
            texs["op"] = op_desc
            rec["op"] = (0.0, 0.0, 0.0)
            rec["kr2"] = tuple(kr)
            rec["kt2"] = tuple(kt)
        rec["ir"] = float(v0[0])
        remap = bool(int(u1[1]))
        rec["alpha"] = (slot_rough(u1[2], "ru", remap),
                        slot_rough(u1[3], "rv", remap))
    # legacy alias: the Kd descriptor (pack_scene/_pack_mesh and the
    # kernel's HAS_* switches read rec["texs"] but a few paths still
    # look at rec["tex"])
    rec["tex"] = texs.get("kd", ("solid",))
    return rec


def _morton3(xi: np.ndarray, yi: np.ndarray, zi: np.ndarray) -> np.ndarray:
    """Interleave three 10-bit grid coordinates into a 30-bit Morton code."""
    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v
    return part(xi) | (part(yi) << np.uint64(1)) | (part(zi) << np.uint64(2))


# How triangles are permuted before being chopped into consecutive
# SUB_TRIS / CLUSTER / SUPER*CLUSTER chunks (any permutation is correct;
# tightness of the resulting chunk AABBs decides how many gated MT
# unrolls the march executes — 75-80% of march cost, VALIDATION.md).
#   "morton": 30-bit centroid Morton sort (rounds 1-3).
#   "median": recursive largest-extent median split whose split counts
#             are aligned to the chunk hierarchy (super, then cluster,
#             then sub-block) — a balanced kd-tree whose leaves ARE the
#             chunks. CPU accounting on the real meshes (/tmp experiment,
#             VALIDATION.md round 4): any-lane entered sub-blocks per
#             sorted 128-lane wave tile -26% teapot / -8% dragon vs
#             Morton (per-ray enters -2.2x / -1.5x).
# Module default, overridable per-build via RENE_CLUSTER_ORDER.
# "median" measured on-chip round 4 (tpu_session_r4c): teapot wave
# @720p 0.635 vs 0.757 s/spp, dragon mega @720p 0.116 vs 0.124.
CLUSTER_ORDER = "median"


def _median_split_order(c: np.ndarray, units) -> np.ndarray:
    """Permutation of triangle centroids `c` (M,3) by recursive
    largest-extent median split. `units` (descending) aligns every
    split count to the largest chunk size that still fits, so chunks
    of any hierarchy level never straddle a split boundary."""
    m = len(c)
    out = np.empty(m, np.int64)
    pos = 0
    stack = [np.arange(m)]
    while stack:
        idx = stack.pop()
        if len(idx) <= units[-1]:
            out[pos:pos + len(idx)] = idx
            pos += len(idx)
            continue
        unit = next(u for u in units if len(idx) > u)
        cc = c[idx]
        ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
        o = np.argsort(cc[:, ax], kind="stable")
        nleft = ((len(idx) // 2 + unit - 1) // unit) * unit
        nleft = min(nleft, len(idx) - 1)
        stack.append(idx[o[nleft:]])
        stack.append(idx[o[:nleft]])
    return out


def _pack_mesh(buffers_np, mesh_idx: np.ndarray, needs_uv=None):
    """Build the (MESH_ROWS, C*128) cluster table + matid material list.

    Triangles are Morton-ordered by centroid so consecutive 128-tri clusters
    are spatially tight (the SIMD analogue of the reference's BVH leaves,
    main.rs:2417-2908: here the "hierarchy" is one level of AABBs marched by
    every lane in lock-step). Padding slots are degenerate (e1=e2=0 -> MT
    det=0 -> miss); padding clusters carry an inverted AABB and are skipped.
    """
    p = buffers_np["tri_p"][mesh_idx].astype(np.float64)   # (M,3,3)
    n = buffers_np["tri_n"][mesh_idx].astype(np.float64)
    if needs_uv is None:
        needs_uv = _mesh_needs_uv(buffers_np, mesh_idx)
    uv = buffers_np["tri_uv"][mesh_idx].astype(np.float64)  # (M,3,2)
    # material slot = unique (material row, interior medium, exterior
    # medium) triple, so volpath medium-interface tracking works for
    # cluster hits too
    inst = buffers_np["tri_inst"][mesh_idx]
    triples = np.stack([buffers_np["inst_material"][inst],
                        buffers_np["inst_interior"][inst],
                        buffers_np["inst_exterior"][inst]], axis=1)
    uniq, inv = np.unique(triples, axis=0, return_inverse=True)
    mesh_mats = []
    for m, imed, emed in uniq:
        rec = _mat_record(buffers_np, int(m))
        rec["imed"] = int(imed)
        rec["emed"] = int(emed)
        mesh_mats.append(rec)
    cam = buffers_np["camera_to_world"][:3, 3].astype(np.float64)
    geom, n_clusters, box_tab, root, oct = _pack_tris(p, n, uv, inv, cam,
                                                      needs_uv)
    return geom, mesh_mats, n_clusters, box_tab, root, oct


def _pack_tris(p, n, uv, inv, cam, needs_uv):
    """Core cluster-table packer over explicit triangle arrays (world OR
    object space): returns (geom, n_clusters, box_tab)."""
    mesh_rows = MESH_ROWS_UV if needs_uv else MESH_ROWS
    c = p.mean(axis=1)
    if os.environ.get("RENE_CLUSTER_ORDER", CLUSTER_ORDER) == "median":
        order = _median_split_order(
            c, (SUPER * CLUSTER, CLUSTER, _sub_split(CLUSTER)[1]))
    else:
        lo_all = c.min(axis=0)
        ext = np.maximum(c.max(axis=0) - lo_all, 1e-12)
        g = np.clip(((c - lo_all) / ext * 1023.0), 0, 1023).astype(np.uint64)
        order = np.argsort(_morton3(g[:, 0], g[:, 1], g[:, 2]), kind="stable")
    p, n, inv, uv = p[order], n[order], inv[order], uv[order]

    m = p.shape[0]
    n_clusters = (m + CLUSTER - 1) // CLUSTER
    # pad the cluster count to a whole number of SUPER groups (padding
    # blocks carry inverted AABBs and degenerate triangles)
    n_clusters = ((n_clusters + SUPER - 1) // SUPER) * SUPER
    slots = n_clusters * CLUSTER
    geom = np.zeros((mesh_rows, slots), np.float32)
    v0, v1, v2 = p[:, 0], p[:, 1], p[:, 2]
    geom[ROW_V0:ROW_V0 + 3, :m] = v0.T
    geom[ROW_E1:ROW_E1 + 3, :m] = (v1 - v0).T
    geom[ROW_E2:ROW_E2 + 3, :m] = (v2 - v0).T
    geom[ROW_MID, :m] = inv.astype(np.float32)
    geom[ROW_N0:ROW_N0 + 3, :m] = n[:, 0].T
    geom[ROW_D1:ROW_D1 + 3, :m] = (n[:, 1] - n[:, 0]).T
    geom[ROW_D2:ROW_D2 + 3, :m] = (n[:, 2] - n[:, 0]).T
    if needs_uv:
        geom[ROW_UV0:ROW_UV0 + 2, :m] = uv[:, 0].T
        geom[ROW_DUV1:ROW_DUV1 + 2, :m] = (uv[:, 1] - uv[:, 0]).T
        geom[ROW_DUV2:ROW_DUV2 + 2, :m] = (uv[:, 2] - uv[:, 0]).T
    # per-sub-block AABBs in lanes s*6..s*6+5 of ROW_BOX
    n_sub, sub = _sub_split(CLUSTER)
    tlo = np.full((slots, 3), 3e38, np.float32)
    thi = np.full((slots, 3), -3e38, np.float32)
    tlo[:m] = p.min(axis=1)
    thi[:m] = p.max(axis=1)
    clo = tlo.reshape(n_clusters * n_sub, sub, 3).min(axis=1) \
        .reshape(n_clusters, n_sub, 3)
    chi = thi.reshape(n_clusters * n_sub, sub, 3).max(axis=1) \
        .reshape(n_clusters, n_sub, 3)
    box = geom[ROW_BOX].reshape(n_clusters, CLUSTER)
    for s in range(n_sub):
        box[:, s * 6:s * 6 + 3] = clo[:, s]
        box[:, s * 6 + 3:s * 6 + 6] = chi[:, s]
    # super-cluster AABBs over SUPER consecutive (Morton-tight) clusters,
    # groups ordered front-to-back from the camera (order is
    # correctness-neutral; early hits shrink t_best for later groups)
    n_super = n_clusters // SUPER
    glo = clo.min(axis=1).reshape(n_super, SUPER, 3).min(axis=1)
    ghi = chi.max(axis=1).reshape(n_super, SUPER, 3).max(axis=1)
    sup_lane = n_sub * 6  # first free ROW_BOX lane after the sub-boxes
    gctr = 0.5 * (glo + ghi)
    gorder = np.argsort(((gctr - cam) ** 2).sum(axis=1), kind="stable")
    geom = np.ascontiguousarray(
        geom.reshape(mesh_rows, n_super, SUPER * CLUSTER)[:, gorder, :]
        .reshape(mesh_rows, slots))
    # member clusters front-to-back within each group too (also
    # correctness-neutral): early member hits shrink t_best for the rest
    # of the group's unrolled marches
    cctr = 0.5 * (clo.min(axis=1) + chi.max(axis=1))  # (n_clusters, 3)
    cctr = cctr[np.repeat(gorder, SUPER) * SUPER
                + np.tile(np.arange(SUPER), n_super)]
    cdist = ((cctr - cam) ** 2).sum(axis=1).reshape(n_super, SUPER)
    morder = np.argsort(cdist, axis=1, kind="stable")
    flat = (np.arange(n_super)[:, None] * SUPER + morder).reshape(-1)
    geom = np.ascontiguousarray(
        geom.reshape(mesh_rows, n_clusters, CLUSTER)[:, flat, :]
        .reshape(mesh_rows, slots))
    box = geom[ROW_BOX].reshape(n_clusters, CLUSTER)
    box[::SUPER, sup_lane:sup_lane + 3] = glo[gorder]
    box[::SUPER, sup_lane + 3:sup_lane + 6] = ghi[gorder]
    # compact per-group box table (_box_layout): g_rows rows per super
    # group — super AABB at (row 0, lanes 0-5), member sub-block AABBs at
    # rowlane(g*n_sub+s)
    g_rows, rowlane = _box_layout(n_sub)
    tab = np.zeros((n_super, g_rows, 128), np.float32)
    tab[:, 0, 0:6] = box[::SUPER, sup_lane:sup_lane + 6]
    for g in range(SUPER):
        for s in range(n_sub):
            r, lane = rowlane(g * n_sub + s)
            tab[:, r, lane:lane + 6] = box[g::SUPER, s * 6:s * 6 + 6]
    oct = (OCT_ORDER and n_super > 1
           and 8 * n_super * g_rows * 128 * 4 <= OCT_TABLE_MAX_BYTES)
    if oct:
        # 8 per-octant sections (see module OCT_ORDER note). Group
        # centers in geometry order; padding groups (inverted AABBs)
        # project to +inf so they sort last in every section.
        glo_p = glo[gorder]
        ghi_p = ghi[gorder]
        valid = glo_p[:, 0] < 1e37
        secs = np.zeros((8, n_super, g_rows, 128), np.float32)
        for o in range(8):
            sgn = np.array([1.0 - 2.0 * ((o >> 2) & 1),
                            1.0 - 2.0 * ((o >> 1) & 1),
                            1.0 - 2.0 * (o & 1)])
            # min corner projection (monotone sort key, see OCT_BREAK)
            corner = np.where(sgn > 0, glo_p, ghi_p)
            proj = np.where(valid, corner @ sgn, 1e30)
            oo = np.argsort(proj, kind="stable")
            secs[o] = tab[oo]
            secs[o][:, 0, IDX_LANE] = oo.astype(np.float32)
            secs[o][:, 0, MINPJ_LANE] = proj[oo].astype(np.float32)
        flat = secs.reshape(8 * n_super * g_rows, 128)
    else:
        flat = tab.reshape(n_super * g_rows, 128)
    box_tab = np.zeros((((flat.shape[0] + 7) // 8) * 8, 128), np.float32)
    box_tab[:flat.shape[0]] = flat
    # root AABB over the real groups (padding groups are inverted)
    real_lo = tlo[:m].min(axis=0) if m else np.zeros(3)
    real_hi = thi[:m].max(axis=0) if m else np.zeros(3)
    root = (tuple(float(x) for x in real_lo),
            tuple(float(x) for x in real_hi))
    return geom, n_clusters, box_tab, root, oct


INST_MIN_SAVING = 4096  # share a blas only when it saves real slots


def _shared_split(buffers_np, mesh_idx: np.ndarray):
    """Split the non-immediate triangles into per-shared-BLAS instance
    groups and the rest. A blas is SHARED when >=2 triangle instances
    reference it, every such instance is non-emissive with all its
    triangles non-immediate, and the blas fits a VMEM table — those
    instances then march ONE object-space cluster table with
    per-instance ray transforms (the reference's BLAS sharing,
    main.rs:2739-2908) instead of replicating geometry. Returns
    (rest_idx, [(blas_id, [inst_ids]), ...])."""
    if "inst_blas" not in buffers_np:
        return mesh_idx, []
    inst_of = buffers_np["tri_inst"][mesh_idx]
    n_inst = buffers_np["inst_prim_count"].shape[0]
    counts = np.bincount(inst_of, minlength=n_inst)
    by_blas = {}
    for i in np.nonzero(counts > 0)[0]:
        b = int(buffers_np["inst_blas"][i])
        if b < 0 or counts[i] != int(buffers_np["inst_prim_count"][i]):
            continue
        al = int(buffers_np["inst_area_light"][i])
        if int(buffers_np["area_type"][al]) != T.AREA_NULL:
            continue
        by_blas.setdefault(b, []).append(int(i))
    shared = []
    shared_insts = []
    for b, insts in sorted(by_blas.items()):
        ntri_b = int(buffers_np["inst_prim_count"][insts[0]])
        if len(insts) < 2 or ntri_b > HBM_MIN_TRIS:
            continue
        if ntri_b * (len(insts) - 1) < INST_MIN_SAVING:
            continue
        shared.append((b, insts))
        shared_insts.extend(insts)
    if not shared:
        return mesh_idx, []
    keep = ~np.isin(inst_of, shared_insts)
    return mesh_idx[keep], shared


def _pack_inst_mesh(buffers_np, blas_id, inst_ids, mesh_mats, needs_uv):
    """Object-space shared cluster table for one BLAS plus its instance
    table: one 128-lane row per instance — w2o affine in lanes 0-11,
    material slot in lane 12 (slots appended to mesh_mats). The march
    transforms o,d by w2o WITHOUT renormalizing d, so object-space t
    equals world t and instances compete in one t_best."""
    starts = buffers_np["blas_idx_start"]
    i0 = int(starts[blas_id])
    i1 = (int(starts[blas_id + 1]) if blas_id + 1 < len(starts)
          else buffers_np["blas_idx"].shape[0])
    v0 = int(buffers_np["blas_vtx_start"][blas_id])
    idx = buffers_np["blas_idx"][i0:i1].reshape(-1, 3).astype(np.int64) \
        + v0
    p = buffers_np["blas_vtx"][idx].astype(np.float64)
    n = buffers_np["blas_nrm"][idx].astype(np.float64)
    uv = buffers_np["blas_uv"][idx].astype(np.float64)
    # geometric-normal fallback in object space (lib.rs:931-935)
    zero_n = (np.abs(n).sum(axis=(1, 2)) == 0.0)
    if zero_n.any():
        gn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        n = np.where(zero_n[:, None, None],
                     np.broadcast_to(gn[:, None, :], n.shape), n)
    # front-to-back ordering from the first instance's object-space
    # camera (correctness-neutral for the others)
    w2o0 = buffers_np["inst_w2o"][inst_ids[0]].astype(np.float64)
    cam_w = buffers_np["camera_to_world"][:3, 3].astype(np.float64)
    cam_o = w2o0[:, :3] @ cam_w + w2o0[:, 3]
    geom, n_clusters, box, root, oct = _pack_tris(
        p, n, uv, np.zeros(len(p), np.int64), cam_o, needs_uv)
    rows = np.zeros(((len(inst_ids) + 7) // 8 * 8, 128), np.float32)
    for r, i in enumerate(inst_ids):
        rec = _mat_record(buffers_np,
                          int(buffers_np["inst_material"][i]))
        rec["imed"] = int(buffers_np["inst_interior"][i])
        rec["emed"] = int(buffers_np["inst_exterior"][i])
        mesh_mats.append(rec)
        rows[r, 0:12] = buffers_np["inst_w2o"][i].reshape(-1)
        rows[r, 12] = float(len(mesh_mats) - 1)
    return {"geom": geom, "box": box, "n_clusters": n_clusters,
            "inst_rows": rows, "n_inst": len(inst_ids), "root": root,
            "oct": oct}


_TRI_GEOM_KEYS = frozenset((
    "m0", "e0", "m1", "e1", "m2", "e2", "pn", "pk", "n0", "n1", "n2",
    "area", "gn_unit", "v0", "v1", "v2", "uv0", "uv1", "uv2"))


def _freeze(v):
    """Hashable deep-freeze of a record value (dicts/lists -> tuples)."""
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, np.generic):
        return v.item()
    return v


def _fuse_parallelograms(tris):
    """Fuse non-emissive triangle pairs forming a FLAT parallelogram
    (equal vertex normals, affine UVs) into quad records: one plane
    test + two dual-basis dots replaces two full Plücker triangle
    tests AND their barycentric/normal-interp/attribute selects. The
    reference never needs this (RT cores make per-triangle tests free,
    rene-shader/src/lib.rs:886-939); on the VPU the statically unrolled
    test IS the measured 67-81% kernel floor (VALIDATION.md r4u/r4u2),
    and pbrt architectural geometry (cornell walls/boxes, veach plates)
    is parallelogram quads split in two at export. Emissive tris are
    never fused (the emitter set, its solid-angle pdfs and
    trace_emit_pdf stay per-triangle). Returns (remaining_tris, quads);
    radiometrically exact (same geometry, normals, UVs).
    """
    from collections import defaultdict
    out, groups, order = [], defaultdict(list), []
    for rec in tris:
        if rec["emissive"]:
            out.append(rec)
            continue
        key = tuple(sorted((k, _freeze(v)) for k, v in rec.items()
                           if k not in _TRI_GEOM_KEYS))
        if key not in groups:
            order.append(key)
        groups[key].append(rec)
    quads = []

    def vert_uv_n(rec):
        vs = (rec["v0"], rec["v1"], rec["v2"])
        uvs = (rec["uv0"], rec["uv1"], rec["uv2"])
        ns = (rec["n0"], rec["n1"], rec["n2"])
        return vs, uvs, ns

    for key in order:
        group = groups[key]
        used = [False] * len(group)
        edges = defaultdict(list)  # sorted (vkey, vkey) -> [tri index]
        for gi, rec in enumerate(group):
            vs, _, _ = vert_uv_n(rec)
            for a, b in ((0, 1), (1, 2), (2, 0)):
                edges[(min(vs[a], vs[b]), max(vs[a], vs[b]))].append(gi)
        for gi, ra in enumerate(group):
            if used[gi]:
                continue
            vsa, uva, nsa = vert_uv_n(ra)
            done = False
            for a, b in ((0, 1), (1, 2), (2, 0)):
                if done:
                    break
                ekey = (min(vsa[a], vsa[b]), max(vsa[a], vsa[b]))
                for gj in edges[ekey]:
                    if gj == gi or used[gj]:
                        continue
                    rb = group[gj]
                    vsb, uvb, nsb = vert_uv_n(rb)
                    shared = {vsa[a], vsa[b]}
                    oth_b = [k for k in range(3) if vsb[k] not in shared]
                    if len(oth_b) != 1:
                        continue  # degenerate / duplicated vertex
                    p = np.asarray(vsa[a])
                    q = np.asarray(vsa[b])
                    r = np.asarray(vsa[3 - a - b])
                    s = np.asarray(vsb[oth_b[0]])
                    scale = max(1e-20, float(np.abs(
                        np.stack([p, q, r, s])).max()))
                    eps = 1e-5 * scale
                    # parallelogram: diagonals share a midpoint (this
                    # also implies coplanarity: s = p+q-r lies in the
                    # p,q,r plane)
                    if np.abs(r + s - (p + q)).max() > eps:
                        continue
                    # flat shading: all 6 vertex normals equal
                    nall = np.asarray(nsa + nsb, np.float64)
                    nscale = max(1e-20,
                                 float(np.abs(nall).max()))
                    if (np.abs(nall - nall[0]).max()
                            > 1e-5 * nscale):
                        continue
                    # UV continuity on the shared edge + affine UVs
                    # over the quad (uv_s = uv_p + uv_q - uv_r)
                    uv_of_b = {vsb[k]: np.asarray(uvb[k])
                               for k in range(3)}
                    uv_p = np.asarray(uva[a])
                    uv_q = np.asarray(uva[b])
                    uv_r = np.asarray(uva[3 - a - b])
                    uv_s = uv_of_b[vsb[oth_b[0]]]
                    uvscale = max(1.0, float(np.abs(np.stack(
                        [uv_p, uv_q, uv_r, uv_s])).max()))
                    ueps = 1e-5 * uvscale
                    if (np.abs(uv_of_b[vsa[a]] - uv_p).max() > ueps
                            or np.abs(uv_of_b[vsa[b]] - uv_q).max()
                            > ueps
                            or np.abs(uv_r + uv_s
                                      - (uv_p + uv_q)).max() > ueps):
                        continue
                    # quad parameterization x = r + u*(p-r) + v*(q-r),
                    # (u,v) in [0,1]^2 covers corners r,p,s,q; dual
                    # vectors du,dv give u = (x-r).du, v = (x-r).dv
                    e1 = p - r
                    e2 = q - r
                    n_pl = np.cross(e1, e2)
                    area = float(np.linalg.norm(n_pl))
                    if area < 1e-20:
                        continue
                    du = np.cross(e2, n_pl)
                    du = du / np.dot(e1, du)  # denom = |n_pl|^2 > 0
                    dv = np.cross(n_pl, e1)
                    dv = dv / np.dot(e2, dv)
                    quad = {k: v for k, v in ra.items()
                            if k not in _TRI_GEOM_KEYS}
                    quad.update({
                        "qa": tuple(r), "du": tuple(du),
                        "dv": tuple(dv),
                        "pn": tuple(n_pl),
                        "pk": float(np.dot(n_pl, r)),
                        "n": tuple(np.asarray(nsa[0], np.float64)),
                        "uva": tuple(uv_r),
                        "duv1": tuple(uv_p - uv_r),
                        "duv2": tuple(uv_q - uv_r),
                        "area": area,
                        "gn_unit": tuple(n_pl / area),
                    })
                    quads.append(quad)
                    used[gi] = used[gj] = True
                    done = True
                    break
        out.extend(rec for gi, rec in enumerate(group) if not used[gi])
    return out, quads


def _sph_uniform(o2w):
    """(ok, center, radius) when the sphere transform is rigid +
    uniform scale — the cases the table's center/radius test covers;
    anything else (true ellipsoids) stays an immediate."""
    m = np.asarray(o2w, np.float64)
    a = m[:3, :3]
    g = a.T @ a
    s2 = float(np.trace(g)) / 3.0
    if s2 <= 0 or not np.allclose(g, np.eye(3) * s2, rtol=1e-4,
                                  atol=1e-6 * max(s2, 1e-12)):
        return False, None, 0.0
    return True, m[:3, 3].copy(), float(np.sqrt(s2))


def _pack_sphere_table(spheres):
    """Split a >MAX_SPHERES sphere list into (immediates, table, mats,
    n_blocks): non-emissive uniform-scale solid-material spheres into
    Morton-ordered 128-slot blocks (layout: module SPH_* constants),
    everything else staying an immediate record. Returns table=None if
    the split cannot satisfy the immediate budget."""
    tbl, imm = [], []
    for rec in spheres:
        ok, c, r = _sph_uniform(rec["o2w"])
        if ok and not rec["emissive"] and not rec.get("texs"):
            tbl.append((c, r, rec))
        else:
            imm.append(rec)
    if not tbl or len(imm) > MAX_SPHERES or len(tbl) > SPH_TABLE_MAX:
        return spheres, None, None, 0
    matkeys = ("albedo", "eta", "k", "alpha", "ir", "mat_type",
               "op", "kr2", "kt2", "imed", "emed", "rrm", "fscale")
    slot_of, mats, mids = {}, [], []
    for _, _, rec in tbl:
        key = _freeze(tuple(rec.get(k) for k in matkeys))
        if key not in slot_of:
            slot_of[key] = len(mats)
            mats.append(rec)
        mids.append(slot_of[key])
    cs = np.array([c for c, _, _ in tbl], np.float64)
    rs = np.array([r for _, r, _ in tbl], np.float64)
    lo = cs.min(0)
    ext = np.maximum(cs.max(0) - lo, 1e-9)
    q = np.clip(((cs - lo) / ext * 1023.0).astype(np.int64), 0, 1023)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]),
                       kind="stable")
    cs, rs = cs[order], rs[order]
    mids = np.asarray(mids, np.float64)[order]
    n = len(tbl)
    nb = (n + SPH_BLOCK - 1) // SPH_BLOCK
    table = np.zeros((SPH_ROWS, nb * SPH_BLOCK), np.float32)
    table[3, :] = -1.0  # padding slots: r <= 0 never passes the test
    for ch in range(3):
        table[ch, :n] = cs[:, ch]
    table[3, :n] = rs
    table[4, :n] = mids
    for b in range(nb):
        s0, s1 = b * SPH_BLOCK, min((b + 1) * SPH_BLOCK, n)
        table[SPH_ROW_BOX, b * SPH_BLOCK:b * SPH_BLOCK + 3] = \
            (cs[s0:s1] - rs[s0:s1, None]).min(0)
        table[SPH_ROW_BOX, b * SPH_BLOCK + 3:b * SPH_BLOCK + 6] = \
            (cs[s0:s1] + rs[s0:s1, None]).max(0)
    return imm, table, mats, nb


def _attr_signature(rec):
    """Stable constant-attribute signature used to sort quad records so
    same-valued runs share a prefix (maximizes _LazyAttr skips)."""
    return repr((rec.get("mat_type"), rec.get("albedo"), rec.get("eta"),
                 rec.get("k"), rec.get("alpha"), rec.get("ir"),
                 rec.get("imed"), rec.get("emed"),
                 sorted(rec.get("texs", {}).items()),
                 rec.get("n"), rec.get("fscale")))


class _LazyAttr:
    """Invariant-select elision for the brute-unroll shading attributes.

    The unrolled primitive loops accumulate per-hit shading attributes
    as `attr[k] = where(ok, val, attr[k])` chains — ~18 selects per
    record per trace, roughly HALF the measured unroll cost
    (VALIDATION.md r4u: cornell is 67% brute-unroll). But in real
    scenes most vals are per-record Python constants shared across
    records (one material family dominates a scene), so most selects
    are provably no-ops at kernel-build time. This accumulator keeps a
    key symbolic while every write equals the engine DEFAULT:

      state[k] = ('const',)   no op emitted yet; every write == default
                 ('arr', a)   materialized; miss lanes hold the default

    The first non-default write materializes `where(ok, val,
    splat(default))`; miss lanes therefore already hold exactly what the
    eager chain would have left, so elision is bit-identical. The reference
    needs none of this: its closest-hit shader reads attributes through
    a per-hit pointer (rene-shader/src/lib.rs:886-939); on the VPU the
    select chain IS the attribute fetch. RENE_ATTR_ELIDE=1 opts in —
    measured perf-NEUTRAL on-chip (r4w; Mosaic already folds the
    invariant chains), kept for its smaller kernel bodies and as the
    documented probe of the select-chain hypothesis.
    """

    def __init__(self, defaults, zero, eager=False):
        import jax.numpy as jnp
        self._jnp = jnp
        self.defaults = {k: float(d) for k, d in defaults.items()}
        self.zero = zero  # data-derived zeros (Mosaic splat landmine)
        self.state = {}
        for k, d in self.defaults.items():
            if eager:
                self.state[k] = ("arr", zero + d)
            else:
                self.state[k] = ("const",)

    def _scalar(self, v):
        return isinstance(v, (int, float, np.floating))

    def update(self, ok, vals):
        jnp = self._jnp
        for key, val in vals.items():
            st = self.state[key]
            if st[0] == "const":
                d = self.defaults[key]
                if self._scalar(val) and float(val) == d:
                    continue  # provably a no-op select
                self.state[key] = ("arr",
                                   jnp.where(ok, val, self.zero + d))
            else:
                self.state[key] = ("arr", jnp.where(ok, val, st[1]))

    def finalize(self, hit):
        """Materialize every key. Miss lanes already hold the engine
        defaults (the const→arr transition splats them), so this is a
        pure lookup — exact eager parity, no extra selects."""
        del hit  # kept for signature stability with earlier designs
        attr = {}
        for key, st in self.state.items():
            if st[0] == "const":
                attr[key] = self.zero + self.defaults[key]
            else:
                attr[key] = st[1]
        return attr


def pack_scene(buffers_np, config: RenderConfig) -> PallasScene:
    ntri = config.num_triangles
    mesh_hbm = False
    mesh_box = None
    inst_meshes = []
    if ntri > MAX_TRIS:
        imm = _immediate_tri_mask(buffers_np)[:ntri]
        imm_idx = np.nonzero(imm)[0]
        mesh_idx = np.nonzero(~imm)[0]
        rest_idx, shared = _shared_split(buffers_np, mesh_idx)
        needs_uv = _mesh_needs_uv(buffers_np, mesh_idx)
        mesh_root = None
        mesh_oct = False
        if rest_idx.size:
            (mesh_geom, mesh_mats, n_clusters, mesh_box,
             mesh_root, mesh_oct) = _pack_mesh(buffers_np, rest_idx,
                                               needs_uv=needs_uv)
        else:
            mesh_geom, mesh_mats, n_clusters = None, [], 0
        for b, insts in shared:
            inst_meshes.append(_pack_inst_mesh(buffers_np, b, insts,
                                               mesh_mats, needs_uv))
        mesh_hbm = rest_idx.size > HBM_MIN_TRIS
    else:
        imm_idx = np.arange(ntri)
        mesh_geom, mesh_mats, n_clusters = None, None, 0
        mesh_root = None
        mesh_oct = False

    tris = []
    for i in imm_idx:
        p = buffers_np["tri_p"][i].astype(np.float64)
        n = buffers_np["tri_n"][i].astype(np.float64)
        inst = int(buffers_np["tri_inst"][i])
        mat = _mat_record(buffers_np, int(buffers_np["inst_material"][inst]))
        al = int(buffers_np["inst_area_light"][inst])
        v0, v1, v2 = p[0], p[1], p[2]
        gn = np.cross(v1 - v0, v2 - v0)
        rec = {
            # Plücker edge constants: side = d.m + w.e
            "m0": tuple(np.cross(v0, v1)), "e0": tuple(v1 - v0),
            "m1": tuple(np.cross(v1, v2)), "e1": tuple(v2 - v1),
            "m2": tuple(np.cross(v2, v0)), "e2": tuple(v0 - v2),
            # plane: t = (k - o.n)/(d.n)
            "pn": tuple(gn), "pk": float(np.dot(gn, v0)),
            "n0": tuple(n[0]), "n1": tuple(n[1]), "n2": tuple(n[2]),
            "area": float(0.5 * np.linalg.norm(gn)),
            "gn_unit": tuple(gn / max(np.linalg.norm(gn), 1e-20)),
            "prim_count": int(buffers_np["inst_prim_count"][inst]),
            "emissive": int(buffers_np["area_type"][al]) != T.AREA_NULL,
            "emit": tuple(float(x) for x in buffers_np["area_color"][al]),
            "v0": tuple(v0), "v1": tuple(v1), "v2": tuple(v2),
            "uv0": tuple(float(x) for x in buffers_np["tri_uv"][i][0]),
            "uv1": tuple(float(x) for x in buffers_np["tri_uv"][i][1]),
            "uv2": tuple(float(x) for x in buffers_np["tri_uv"][i][2]),
            "imed": int(buffers_np["inst_interior"][inst]),
            "emed": int(buffers_np["inst_exterior"][inst]),
        }
        rec.update(mat)
        tris.append(rec)

    quads = []
    attr_elide = os.environ.get("RENE_ATTR_ELIDE", "0") == "1"
    if os.environ.get("RENE_QUAD_FUSE", "1") != "0":
        tris, quads = _fuse_parallelograms(tris)
        if attr_elide:
            # group same-constant runs so _LazyAttr's prefix skips cover
            # the longest run of each attribute value (quads are never
            # emissive, so order only moves degenerate exact-t ties);
            # gated with the elision knob to keep default kernel cache
            # keys byte-stable
            quads.sort(key=_attr_signature)

    spheres = []
    for s in range(config.num_spheres):
        inst = int(buffers_np["sph_inst"][s])
        mat = _mat_record(buffers_np, int(buffers_np["inst_material"][inst]))
        al = int(buffers_np["inst_area_light"][inst])
        rec = {
            "w2o": buffers_np["sph_w2o"][s].astype(float).tolist(),
            "o2w": buffers_np["sph_o2w"][s].astype(float).tolist(),
            "emissive": int(buffers_np["area_type"][al]) != T.AREA_NULL,
            "emit": tuple(float(x) for x in buffers_np["area_color"][al]),
            "imed": int(buffers_np["inst_interior"][inst]),
            "emed": int(buffers_np["inst_exterior"][inst]),
        }
        rec.update(mat)
        spheres.append(rec)

    sph_table, sph_mats, n_sph_blocks = None, None, 0
    if len(spheres) > MAX_SPHERES:
        spheres, sph_table, sph_mats, n_sph_blocks = \
            _pack_sphere_table(spheres)

    emit_objects = []
    for e in range(config.num_emit_objects):
        kind = int(buffers_np["eo_kind"][e])
        if kind == T.KIND_TRIANGLE:
            start = int(buffers_np["eo_tri_start"][e])
            count = int(buffers_np["eo_prim_count"][e])
            prims = []
            for pidx in range(start, start + count):
                p = buffers_np["tri_p"][pidx].astype(float)
                prims.append((tuple(p[0]), tuple(p[1]), tuple(p[2])))
            emit_objects.append({"kind": "tri", "prims": prims})
        else:
            emit_objects.append({
                "kind": "sphere",
                "o2w": buffers_np["eo_matrix"][e].astype(float).tolist()})

    lights = []
    for li in range(config.num_lights):
        lights.append({
            "dir": tuple(float(x) for x in buffers_np["light_dir"][li]),
            "color": tuple(float(x) for x in buffers_np["light_color"][li]),
        })
    light_table = None
    if len(lights) > MAX_LIGHTS:
        lrows = ((len(lights) + 7) // 8) * 8
        light_table = np.zeros((lrows, 128), np.float32)
        for li, lt in enumerate(lights):
            light_table[li, 0:3] = lt["dir"]
            light_table[li, 3:6] = lt["color"]

    if config.integrator == "volpath":
        from .volpath import max_depth_for
    else:
        from .path import max_depth_for

    # homogeneous-medium records (medium.rs); index 0 is always vacuum
    media = []
    for mi in range(buffers_np["med_type"].shape[0]):
        media.append({
            "vacuum": int(buffers_np["med_type"][mi]) == T.MEDIUM_VACUUM,
            "sigma_a": tuple(float(x)
                             for x in buffers_np["med_sigma_a"][mi]),
            "sigma_s": tuple(float(x)
                             for x in buffers_np["med_sigma_s"][mi]),
            "g": float(buffers_np["med_g"][mi]),
        })

    # image atlas: channel-planar (3*rows, 128) VMEM table over the images
    # the kernel fetches (background env map + matte Kd imagemaps)
    used_imgs = _kernel_images(buffers_np, config)
    img_table = None
    img_rows = 0
    img_packed = False
    bases = {}
    if used_imgs:
        rows = 0
        for ii in used_imgs:
            bases[ii] = rows
            rows += _image_rows(buffers_np, ii)
        rows = ((rows + IMG_PAGE - 1) // IMG_PAGE) * IMG_PAGE
        img_rows = rows
        # RGB9E5-packed (rows,128) atlas by default: one u32 per texel
        # (bitcast-stored as f32) -> ONE gather per bilinear corner per
        # page instead of three. device.py already quantized the texels
        # onto the RGB9E5 grid, so this encode is lossless and the
        # in-kernel decode reproduces the XLA engine's floats exactly.
        # RENE_IMG_PACK=0 restores the 3-channel-planar layout (A/B).
        img_packed = os.environ.get("RENE_IMG_PACK", "1") != "0"
        img_table = np.zeros(((rows if img_packed else 3 * rows), 128),
                             np.float32)
        atlas = buffers_np["img_atlas"]
        for ii in used_imgs:
            w = int(buffers_np["img_width"][ii])
            h = int(buffers_np["img_height"][ii])
            off = int(buffers_np["img_offset"][ii])
            n = w * h
            nr = (n + 127) // 128
            pad = np.zeros((nr * 128, 3), np.float32)
            pad[:n] = atlas[off:off + n, :3]
            b = bases[ii]
            if img_packed:
                from ..ops.rgb9e5 import encode
                img_table[b:b + nr, :] = \
                    encode(pad).view(np.float32).reshape(nr, 128)
            else:
                for ch in range(3):
                    img_table[ch * rows + b: ch * rows + b + nr, :] = \
                        pad[:, ch].reshape(nr, 128)

        def resolve(rec):
            """Image descriptors -> atlas (base_row, w, h) across every
            slot class."""
            for cls, d in list(rec.get("texs", {}).items()):
                if d[0] == "image":
                    ii = d[1]
                    rec["texs"][cls] = (
                        "image", bases[ii],
                        int(buffers_np["img_width"][ii]),
                        int(buffers_np["img_height"][ii]))
            rec["tex"] = rec.get("texs", {}).get("kd", ("solid",))
        for rec in tris:
            resolve(rec)
        for rec in quads:
            resolve(rec)
        for rec in spheres:
            resolve(rec)
        for rec in (mesh_mats or []):
            resolve(rec)

    # miss radiance = texture(background) * background_color; solids
    # (and scale-of-solids) fold into the constant, an imagemap (or
    # scale-of-imagemap, base folded) is fetched per miss, a checker
    # with solid subs evaluates inline from the miss uv
    bg_tex = int(buffers_np["background_texture"])
    bg_img = None
    bg_checker = None
    bg_desc = _tex_kernel_desc(buffers_np, bg_tex)
    bg_color = tuple(float(x) for x in buffers_np["background_color"])
    if bg_desc is not None and bg_desc[0] == "image":
        ii, base = bg_desc[1], bg_desc[2]
        bg_img = (bases[ii], int(buffers_np["img_width"][ii]),
                  int(buffers_np["img_height"][ii]))
        background = tuple(bg_color[i] * base[i] for i in range(3))
    elif bg_desc is not None and bg_desc[0] == "checker":
        bg_checker = bg_desc[1:]
        background = bg_color
    else:
        rgb = bg_desc[1] if bg_desc is not None else (0.0, 0.0, 0.0)
        background = tuple(float(rgb[i] * bg_color[i]) for i in range(3))

    # infinite-light importance sampling table (config.env_nee): rows
    # [0, GW) the TRANSPOSED conditional CDFs (row j = entry j of every
    # row's conditional CDF along the first GH lanes — the kernel's
    # conditional search gathers static ccdfT rows at the per-lane
    # marginal row, see env_strategy), rows [GW, GW+GH) the per-texel
    # solid-angle pdfs, row GW+GH the marginal CDF (lanes >= GH padded
    # with 1.0), then zero rows up to the f32 sublane tile (8)
    env_tab = None
    if getattr(config, "env_nee", False) and bg_img is not None:
        from ..scene.device import ENV_GH, ENV_GW
        assert ENV_GW == 128, "env table rows are VPU lanes"
        nrows = ((ENV_GW + ENV_GH + 1 + 7) // 8) * 8
        env_tab = np.zeros((nrows, 128), np.float32)
        env_tab[:ENV_GW, :ENV_GH] = buffers_np["env_ccdf"].T
        env_tab[ENV_GW:ENV_GW + ENV_GH] = buffers_np["env_pdf"]
        env_tab[ENV_GW + ENV_GH, :] = 1.0
        env_tab[ENV_GW + ENV_GH, :ENV_GH] = buffers_np["env_mcdf"]
    return PallasScene(
        tris=tris, quads=quads, spheres=spheres,
        emit_objects=emit_objects,
        lights=lights,
        background=background,
        img_table=img_table, img_rows=img_rows, bg_img=bg_img,
        img_packed=(img_table is not None and img_packed),
        bg_matrix=np.asarray(buffers_np["background_matrix"],
                             np.float64),
        env_tab=env_tab,
        bg_matrix_inv=np.asarray(
            buffers_np.get("background_matrix_inv", np.eye(4)),
            np.float64),
        cam_proj_inv=np.asarray(buffers_np["camera_proj_inv"], np.float64),
        cam_to_world=np.asarray(buffers_np["camera_to_world"], np.float64),
        width=config.film.xresolution, height=config.film.yresolution,
        max_depth=max_depth_for(config), num_emit=config.num_emit_objects,
        filter_radius=float(getattr(config, "filter_radius", 0.0)),
        sampler=getattr(config, "sampler", "independent"),
        mesh_geom=mesh_geom, mesh_mats=mesh_mats, n_clusters=n_clusters,
        mesh_hbm=mesh_hbm, mesh_box=mesh_box, mesh_root=mesh_root,
        mesh_oct=mesh_oct,
        inst_meshes=inst_meshes or None,
        integrator=config.integrator, media=media,
        attr_elide=attr_elide,
        sph_table=sph_table, sph_mats=sph_mats,
        n_sph_blocks=n_sph_blocks, light_table=light_table,
        bg_checker=bg_checker)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _build_kernel(ps: PallasScene, num_samples: int, interpret: bool,
                  wave_k: int = 0, wave_spw: int = 0,
                  wave_bounds=None, wave_dir_sub: bool = False,
                  wave_genesis: bool = False, sub_gate=None,
                  pack: int = 1, sub_tris: int = 0):
    """num_samples: regeneration target of the megakernel (ignored in
    wave mode). wave_k > 0 builds the WAVEFRONT kernel instead: a
    k-bounce chunk over an externally sorted ray-state array (see
    pallas_wave.py — cross-tile ray redistribution between launches
    breaks the any-lane SIMT wall of the cluster march). wave_spw:
    lanes per pixel (the sobol sampler derives the pixel-global sample
    index from the lane's slot). wave_bounds: (lo3, ext3) scene bounds
    for the WROW_KEY Morton fallback of non-cluster hits. pack > 1
    (megakernel only): sample-in-tile packing — the tile's 1024 lanes
    cover a (32/sqrt(pack))^2-pixel block x `pack` sample slots, so the
    tile's camera beam is as tight as a render at sqrt(pack)x the
    resolution (r4g proxy: dragon @720p 0.108 -> 0.083 predicted at
    pack=16). Each slot gets decorrelated streams: the lane-id RNG key
    and the sobol pixkey both mix in the slot index."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # snapshot the gating knob at BUILD time: kernels trace lazily (the
    # wave runner builds its kernels under set/restore of module knobs)
    sub_gate = SUB_GATE if sub_gate is None else sub_gate
    # Debug-only cost ablations for on-chip profiling (tpu_session_r4u):
    # "nee" drops the emitter-MIS block, "dbltris" runs the brute
    # triangle unroll twice on an imperceptibly perturbed ray (defeats
    # CSE) so the unroll's marginal cost is directly measurable. Never
    # set in production; renders are wrong/redundant under ablation.
    ABLATE = frozenset(
        x for x in os.environ.get("RENE_MEGA_ABLATE", "").split(",") if x)
    # invariant attribute-select elision in the brute unroll (_LazyAttr;
    # RENE_ATTR_ELIDE=1 opts in, read ONCE at pack time and threaded via
    # ps.attr_elide so pack and build can never disagree). MEASURED
    # NEUTRAL on-chip (r4w: cornell 2010 vs 2009 Mrays/s, veach 982 vs
    # 985 — Mosaic already folds the invariant select chains / the
    # unroll is latency-bound), so the default stays eager to keep
    # kernel cache keys byte-stable.
    ATTR_ELIDE = ps.attr_elide
    SHAPE = ((MESH_TILE_SUB
              if (ps.n_clusters or ps.inst_meshes or wave_k)
              else TILE_SUB), 128)
    W = ps.width
    H = ps.height
    NPIX = W * H
    MAXD = ps.max_depth
    E = ps.num_emit
    VOL = ps.integrator == "volpath"
    # Russian roulette is disabled in the reference volpath (lib.rs:787-799)
    use_rr = (MAXD > RR_START + 1) and not VOL
    INV_PI = 1.0 / math.pi
    TWO_PI = 2.0 * math.pi
    BIG = 3e38

    def _bits_to_unit(bits):
        """uint32 -> [0,1) via mantissa bitcast (no uint->float cast,
        which Mosaic does not support)."""
        mant = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
        if interpret:
            return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0
        return pltpu.bitcast(mant, jnp.float32) - 1.0

    def _i2f_small(x_u32):
        """uint32 (< 2^23) -> exact float via the magic-number bitcast
        (same no-int-cast constraint as _bits_to_unit)."""
        m = x_u32 | jnp.uint32(0x4B000000)
        if interpret:
            return jax.lax.bitcast_convert_type(m, jnp.float32) \
                - 8388608.0
        return pltpu.bitcast(m, jnp.float32) - 8388608.0

    def uniform(st):
        """(u, new_state). On TPU the on-chip generator supplies the bits
        and `st` is pass-through; in interpret mode (CPU validation) a
        carried xorshift32 stream stands in."""
        if interpret:
            st = st ^ (st << jnp.uint32(13))
            st = st ^ (st >> jnp.uint32(17))
            st = st ^ (st << jnp.uint32(5))
            return _bits_to_unit(st), st
        bits = pltpu.bitcast(pltpu.prng_random_bits(SHAPE), jnp.uint32)
        return _bits_to_unit(bits), st

    # Sampler "sobol": per sampling decision ("pair"), draw the padded
    # Owen-scrambled (0,2)-sequence point for the lane's sample number,
    # keyed by (pixel, depth, static slot, chunk seed) — ops/sobol.py;
    # uint vector ops probed in tpu_session_r3ac. Media/phase draws and
    # anything inside helpers stay on the PRNG (unbiased mix).
    SOBOL = getattr(ps, "sampler", "independent") == "sobol"
    (SLOT_CAM, SLOT_BSDF, SLOT_COIN, SLOT_NEE1, SLOT_NEE2, SLOT_RR,
     SLOT_MISC, SLOT_MED) = range(8)
    if SOBOL:
        from ..ops import sobol as _sob

        def _u32(x_i32):
            if interpret:
                return jax.lax.bitcast_convert_type(x_i32, jnp.uint32)
            return pltpu.bitcast(x_i32, jnp.uint32)

        def ld2(idx_i, keyv, dep_i, slot):
            """Owen-scrambled (0,2) point for int32 sample index idx_i
            at decision (dep_i, slot) of the pixel keyed by keyv."""
            key = (keyv
                   ^ (_u32(dep_i) * jnp.uint32(0x9E3779B9))
                   ^ jnp.uint32((slot * 0x632BE59B) & 0xFFFFFFFF))
            ub, vb = _sob.ld2_bits(_u32(idx_i) & jnp.uint32(0xFFFF),
                                   key)
            return _bits_to_unit(ub), _bits_to_unit(vb)

        def sob_pixkey(pxf, pyf, seed_u):
            pid = _u32((pxf + pyf * float(W)).astype(jnp.int32))
            return _sob.hash_u32(pid ^ (seed_u * jnp.uint32(0x85EBCA6B)))

    def dot3(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    def normalize3(x, y, z):
        inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
        return x * inv, y * inv, z * inv

    _all_recs = (ps.tris + ps.quads + ps.spheres
                 + (ps.mesh_mats or []) + (ps.sph_mats or []))
    MATSET = {r["mat_type"] for r in _all_recs}
    HAS_UBER = T.MAT_UBER in MATSET
    HAS_IMG = ps.img_table is not None
    HAS_MESH_UV = any(r.get("texs") for r in (ps.mesh_mats or []))

    def _img_descs(cls):
        return [r["texs"][cls] for r in _all_recs
                if r.get("texs", {}).get(cls, ("solid",))[0] == "image"]

    # image-descriptor slot classes this scene actually uses; each gets
    # (base,w,h) attr rows and one bounded fetch sweep per bounce
    ACTIVE_IMG_CLASSES = tuple(c for c in IMG_CLASSES if _img_descs(c))
    HAS_IMG_MATS = bool(ACTIVE_IMG_CLASSES)
    HAS_RRM = any(r.get("rrm") for r in _all_recs)
    HAS_MSCALE = any(tuple(r.get("fscale", (1.0, 1.0, 1.0)))
                     != (1.0, 1.0, 1.0) for r in _all_recs)
    BG_IMG = ps.bg_img
    NPAGES = (ps.img_rows // IMG_PAGE) if HAS_IMG else 0
    IMG_ROWS = ps.img_rows
    # static page ranges per fetch site (class)
    CLS_PRANGE = {}
    for _c in ACTIVE_IMG_CLASSES:
        _ds = _img_descs(_c)
        CLS_PRANGE[_c] = (
            min(t[1] for t in _ds) // IMG_PAGE,
            -(-max(t[1] + (t[2] * t[3] + 127) // 128
                   for t in _ds) // IMG_PAGE))
    if BG_IMG is not None:
        BG_PMIN = BG_IMG[0] // IMG_PAGE
        BG_PMAX = -(-(BG_IMG[0] + (BG_IMG[1] * BG_IMG[2] + 127) // 128)
                    // IMG_PAGE)

    IMG_PACKED = getattr(ps, "img_packed", False)

    def _f2u(x):
        if interpret:
            return jax.lax.bitcast_convert_type(x, jnp.uint32)
        return pltpu.bitcast(x, jnp.uint32)

    def _u2f(x):
        if interpret:
            return jax.lax.bitcast_convert_type(x, jnp.float32)
        return pltpu.bitcast(x, jnp.float32)

    def _rgb9e5_dec(vf):
        """f32-bitcast RGB9E5 u32 -> exact (r, g, b) f32 (ops/rgb9e5).
        Mantissas via the 1.0-bias bitcast (no int->float casts on
        Mosaic), the shared power-of-two scale via exponent-bit
        construction — every step exact, so the kernel sees the same
        floats the XLA engine reads from the quantized atlas."""
        u = _f2u(vf)
        nine = jnp.uint32(9)
        m511 = jnp.uint32(511)
        one = jnp.uint32(0x3F800000)

        def man(m):  # m in [0,511]: bitcast(1.0|m) - 1.0 == m * 2^-23
            return _u2f(m | one) - 1.0

        r = man(u & m511)
        g = man((u >> nine) & m511)
        b = man((u >> jnp.uint32(18)) & m511)
        e5 = (u >> jnp.uint32(27)) & jnp.uint32(31)
        # scale = 2^(e-24) * 2^23 = 2^(e-1): float bits (e+126)<<23
        sc = _u2f((e5 + jnp.uint32(126)) << jnp.uint32(23))
        return r * sc, g * sc, b * sc

    def fetch_image(iref, u, v, wf, hf, base_row, active,
                    pmin=0, pmax=None):
        """Bilinear REPEAT fetch (texture.rs:124 / ops/texture.py
        sample_image parity, v flipped) from the channel-planar VMEM
        atlas. wf/hf/base_row are per-lane, so one sweep serves mixed
        images. The sweep is bounded three ways: the static page range of
        the images this call site can touch [pmin, pmax), traced bounds
        from the active lanes' row min/max (coherent fetches visit a
        handful of pages), and an any-lane lax.cond per page. Per page:
        static-row broadcasts + lane gathers — the only per-lane gather
        Mosaic lowers."""
        if pmax is None:
            pmax = NPAGES
        x = u * wf - 0.5
        y = (1.0 - v) * hf - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        def wrap(a, m):
            m = jnp.maximum(m, 1.0)
            return a - jnp.floor(a / m) * m

        xs = (wrap(x0, wf), wrap(x0 + 1.0, wf))
        ys = (wrap(y0, hf), wrap(y0 + 1.0, hf))
        rows = []
        lanes = []
        for yy, xx in ((ys[0], xs[0]), (ys[0], xs[1]),
                       (ys[1], xs[0]), (ys[1], xs[1])):
            flat = base_row * 128.0 + yy * wf + xx
            r = jnp.floor(flat * (1.0 / 128.0))
            rows.append(jnp.where(active, r, -1.0).astype(jnp.int32))
            lanes.append((flat - r * 128.0).astype(jnp.int32))
        zero = u * 0.0
        vals = tuple([zero] * (4 if IMG_PACKED else 12))

        # traced sweep bounds from the lanes that actually fetch
        big_i = jnp.int32(1 << 30)
        rlo = jnp.full(SHAPE, big_i)
        rhi = jnp.full(SHAPE, -1, jnp.int32)
        for r in rows:
            live = r >= 0
            rlo = jnp.minimum(rlo, jnp.where(live, r, big_i))
            rhi = jnp.maximum(rhi, r)
        plo = jnp.maximum(jnp.min(rlo) // IMG_PAGE, pmin)
        phi = jnp.minimum(jnp.max(rhi) // IMG_PAGE + 1, pmax)

        def page_body(p, vals):
            lo = p * IMG_PAGE
            want = jnp.zeros(SHAPE, bool)
            for r in rows:
                want = want | ((r >= lo) & (r < lo + IMG_PAGE))

            def do(vals):
                out = list(vals)
                if IMG_PACKED:
                    # one u32-packed plane: ONE gather+select chain per
                    # bilinear corner serves all three channels (the
                    # r5a partition's 92% fetch share is mostly here)
                    blk = iref[pl.ds(lo, IMG_PAGE), :]
                    rowp = [jnp.broadcast_to(blk[k:k + 1, :], SHAPE)
                            for k in range(IMG_PAGE)]
                    for j in range(4):
                        inp = (rows[j] >= lo) & (rows[j] < lo + IMG_PAGE)
                        g = jnp.take_along_axis(rowp[0], lanes[j],
                                                axis=1)
                        for k in range(1, IMG_PAGE):
                            gk = jnp.take_along_axis(rowp[k], lanes[j],
                                                     axis=1)
                            g = jnp.where(rows[j] == lo + k, gk, g)
                        out[j] = jnp.where(inp, g, out[j])
                    return tuple(out)
                blks = [iref[pl.ds(lo + ch * IMG_ROWS, IMG_PAGE), :]
                        for ch in range(3)]
                rowk = [[jnp.broadcast_to(blks[ch][k:k + 1, :], SHAPE)
                         for k in range(IMG_PAGE)] for ch in range(3)]
                for j in range(4):
                    # gather from EVERY page row, then select by the
                    # lane's own row. (The reverse order — select the
                    # row first, one gather after — was a long-lived
                    # bug: the where-chain keys on the row wanted at
                    # each LANE POSITION, but the gather then reads
                    # lanes[j], whose position wanted a different row.
                    # Coherent camera tiles mostly agree on rows, so
                    # textures only smeared subtly; incoherent env-map
                    # fetches read vertically displaced texels — caught
                    # by the env_nee parity tests, fixed 2026-08.)
                    inp = (rows[j] >= lo) & (rows[j] < lo + IMG_PAGE)
                    for ch in range(3):
                        g = jnp.take_along_axis(rowk[ch][0], lanes[j],
                                                axis=1)
                        for k in range(1, IMG_PAGE):
                            gk = jnp.take_along_axis(rowk[ch][k],
                                                     lanes[j], axis=1)
                            g = jnp.where(rows[j] == lo + k, gk, g)
                        out[j * 3 + ch] = jnp.where(inp, g,
                                                    out[j * 3 + ch])
                return tuple(out)

            return jax.lax.cond(jnp.any(want), do, lambda v: v, vals)

        vals = jax.lax.fori_loop(plo, phi, page_body, vals)
        out = []
        if IMG_PACKED:
            dec = [_rgb9e5_dec(vals[j]) for j in range(4)]
            for ch in range(3):
                c00, c10, c01, c11 = (dec[0][ch], dec[1][ch],
                                      dec[2][ch], dec[3][ch])
                top = c00 * (1.0 - fx) + c10 * fx
                bot = c01 * (1.0 - fx) + c11 * fx
                out.append(top * (1.0 - fy) + bot * fy)
            return out
        for ch in range(3):
            c00, c10, c01, c11 = (vals[ch], vals[3 + ch], vals[6 + ch],
                                  vals[9 + ch])
            top = c00 * (1.0 - fx) + c10 * fx
            bot = c01 * (1.0 - fx) + c11 * fx
            out.append(top * (1.0 - fy) + bot * fy)
        return out

    def atan2_approx(y, x):
        """Vectorized atan2 (Mosaic has no atan2/acos primitive): octant
        reduction + the Cephes atanf core poly on [0, tan(pi/8)]."""
        ax_ = jnp.abs(x)
        ay_ = jnp.abs(y)
        swap = ay_ > ax_
        num = jnp.minimum(ax_, ay_)
        den = jnp.maximum(jnp.maximum(ax_, ay_), 1e-30)
        t = num / den
        hi = t > 0.41421356237
        t = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
        z = t * t
        w = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1
        a = w * z * t + t
        a = a + jnp.where(hi, math.pi / 4.0, 0.0)
        a = jnp.where(swap, math.pi / 2.0 - a, a)
        a = jnp.where(x < 0.0, math.pi - a, a)
        return jnp.where(y < 0.0, -a, a)

    def sphere_uv_of(lx, ly, lz):
        """Spherical uv of a unit-sphere local point (math.rs:70-76,
        lib.rs:874-880)."""
        nx_, ny_, nz_ = normalize3(lx, ly, lz)
        # acos(z) = atan2(sqrt(1-z^2), z)
        theta = atan2_approx(
            jnp.sqrt(jnp.maximum(1.0 - nz_ * nz_, 0.0)), nz_)
        phi = atan2_approx(ny_, nx_)
        phi = jnp.where(phi < 0.0, phi + TWO_PI, phi)
        return phi * (0.5 / math.pi), (theta - math.pi) * (-1.0 / math.pi)

    # ---- infinite-light importance sampling (config.env_nee) ----------
    # The CDF grid was sized for this kernel: every lookup decomposes
    # into take_along_axis lane gathers on BROADCAST rows (the only
    # per-lane gather Mosaic lowers). Crucial subtlety, learned from the
    # fetch_image bug this feature exposed: a where-chain that selects a
    # per-POSITION row and is then gathered at a different lane index
    # reads the row wanted by THAT lane — every gather below therefore
    # reads a row that is STATIC (a broadcast of one table row), with
    # per-position row choices resolved by selecting among gathered
    # VALUES, never among rows.
    # env_tab layout (see pack_scene): rows [0, GW) = ccdfT (row j holds
    # conditional-CDF entry j for all GH rows along the first GH lanes),
    # rows [GW, GW+GH) = per-texel solid-angle pdf, row GW+GH = marginal
    # CDF (lanes >= GH padded with 1.0).
    HAS_ENV = ps.env_tab is not None
    if HAS_ENV:
        from ..scene.device import ENV_GH, ENV_GW

        def _mcdf_search(eref, x):
            """Lower-bound of x in the marginal CDF (one broadcast row;
            the gathered content is lane-independent, so per-position
            gathers are exact)."""
            mrow = jnp.broadcast_to(
                eref[ENV_GW + ENV_GH:ENV_GW + ENV_GH + 1, :], SHAPE)
            lo = (x * 0.0).astype(jnp.int32)
            step = ENV_GH >> 1
            while step:
                v = jnp.take_along_axis(mrow, lo + (step - 1), axis=1)
                lo = jnp.where(v < x, lo + step, lo)
                step >>= 1
            return jnp.minimum(lo, ENV_GH - 1)

        def _ccdf_search(eref, r, x):
            """Lower-bound of x in conditional row r (per-position r).

            At step `step`, the probe index lo+step-1 can only take the
            static values m*2*step + step-1 — for each, ccdfT row
            [probe] is a STATIC broadcast row gathered at the
            per-position r, and the per-position probe VALUE is
            selected from those gathers (sum of 2^s gathers per step,
            127 total)."""
            lo = (x * 0.0).astype(jnp.int32)
            step = ENV_GW >> 1
            while step:
                cand0 = step - 1
                v = jnp.take_along_axis(
                    jnp.broadcast_to(eref[cand0:cand0 + 1, :], SHAPE),
                    r, axis=1)
                m = 1
                while m * 2 * step < ENV_GW:
                    cand = m * 2 * step + step - 1
                    vm = jnp.take_along_axis(
                        jnp.broadcast_to(eref[cand:cand + 1, :], SHAPE),
                        r, axis=1)
                    v = jnp.where(lo == m * 2 * step, vm, v)
                    m += 1
                lo = jnp.where(v < x, lo + step, lo)
                step >>= 1
            return jnp.minimum(lo, ENV_GW - 1)

        def env_strategy(eref, x1, x2, x3, x4):
            """Draw a world direction ~ the env grid distribution."""
            r = _mcdf_search(eref, x1)
            cc = _ccdf_search(eref, r, x2)
            theta = (r.astype(jnp.float32) + x3) * (math.pi / ENV_GH)
            phi = (cc.astype(jnp.float32) + x4) * (TWO_PI / ENV_GW)
            stn = jnp.sin(theta)
            dlx = stn * jnp.cos(phi)
            dly = stn * jnp.sin(phi)
            dlz = jnp.cos(theta)
            m = ps.bg_matrix_inv
            return normalize3(
                m[0, 0] * dlx + m[0, 1] * dly + m[0, 2] * dlz,
                m[1, 0] * dlx + m[1, 1] * dly + m[1, 2] * dlz,
                m[2, 0] * dlx + m[2, 1] * dly + m[2, 2] * dlz)

        def env_pdf_dir(eref, wx, wy, wz):
            """Solid-angle pdf env_strategy would have for (wx,wy,wz):
            gather pdf row k at the per-position column FIRST, then
            select by the per-position row (fetch_image fix pattern)."""
            m = ps.bg_matrix
            dlx = m[0, 0] * wx + m[0, 1] * wy + m[0, 2] * wz
            dly = m[1, 0] * wx + m[1, 1] * wy + m[1, 2] * wz
            dlz = m[2, 0] * wx + m[2, 1] * wy + m[2, 2] * wz
            dlx, dly, dlz = normalize3(dlx, dly, dlz)
            theta = atan2_approx(
                jnp.sqrt(jnp.maximum(1.0 - dlz * dlz, 0.0)), dlz)
            phi = atan2_approx(dly, dlx)
            phi = jnp.where(phi < 0.0, phi + TWO_PI, phi)
            r = jnp.clip((theta * (ENV_GH / math.pi)).astype(jnp.int32),
                         0, ENV_GH - 1)
            cc = jnp.clip((phi * (ENV_GW / TWO_PI)).astype(jnp.int32),
                          0, ENV_GW - 1)
            g = jnp.take_along_axis(
                jnp.broadcast_to(eref[ENV_GW:ENV_GW + 1, :], SHAPE),
                cc, axis=1)
            for k in range(1, ENV_GH):
                gk = jnp.take_along_axis(
                    jnp.broadcast_to(eref[ENV_GW + k:ENV_GW + k + 1, :],
                                     SHAPE), cc, axis=1)
                g = jnp.where(r == k, gk, g)
            return g

    # ---- clustered big-mesh march (see module constants for the layout)
    NC = ps.n_clusters
    INST_MESHES = ps.inst_meshes or []
    NINST = len(INST_MESHES)

    def _inv_dir(dx, dy, dz):
        tiny = 1e-20
        def inv(d):
            return 1.0 / jnp.where(jnp.abs(d) > tiny, d,
                                   jnp.where(d >= 0, tiny, -tiny))
        return inv(dx), inv(dy), inv(dz)

    N_SUB, SUB = _sub_split(CLUSTER, sub_tris)

    # RENE_MESH_TEST=moment swaps the march's per-triangle test for the
    # moment form (below). Build-time knob, default classic MT.
    MESH_MOMENT = os.environ.get("RENE_MESH_TEST", "mt") == "moment"

    def _mt_test(blk, k, ox, oy, oz, dx, dy, dz, wx=None, wy=None,
                 wz=None, d3s=None):
        """Per-triangle test vs slot k of the sliced cluster block;
        returns (t, u, v, ok_geom) — caller applies its own t bounds.

        Classic Moller-Trumbore is a SERIAL chain on the VPU: p=d×e2 →
        det → invd, t0 → u, q=t0×e1 → v → t (each step needs the last).
        The MOMENT form (MESH_MOMENT) rewrites the same determinants via
        the ray moment w = o×d (computed once per march call) and
        per-triangle derived constants

            ngn = e2×e1   ngk = v0·ngn   m_u = v0×e2   m_v = e1×v0

        so that det = d·ngn, u_num = w·e2 + d·m_u, v_num = d·m_v − w·e1,
        t_num = ngk − o·ngn are four INDEPENDENT short dot chains —
        fewer vector ops (~46 vs ~54) and far more ILP for the in-order
        VPU pipeline. The derived constants are computed here from the
        same 9 table scalars as classic MT — pure SCALAR-core work
        (broadcast reads; ~32 scalar ops/tri) that overlaps the VPU,
        with no table-row or HBM-DMA growth. Algebraically identical
        (scalar triple-product identities); floating-point results
        differ at cancellation level, which the interpret parity suite
        bounds. The reference needs neither: RT cores do this in
        silicon (rene-shader/src/lib.rs:194-207)."""
        v0x, v0y, v0z = blk[ROW_V0, k], blk[ROW_V0 + 1, k], blk[ROW_V0 + 2, k]
        e1x, e1y, e1z = blk[ROW_E1, k], blk[ROW_E1 + 1, k], blk[ROW_E1 + 2, k]
        e2x, e2y, e2z = blk[ROW_E2, k], blk[ROW_E2 + 1, k], blk[ROW_E2 + 2, k]
        if d3s is not None:
            # CONSTANT-DIRECTION specialization (distant-light shadow
            # rays: every lane shares one direction). p = d x e2, det
            # and invd collapse to SCALAR-core ops (python consts in
            # the unrolled-lights path, SREG math in table mode) — the
            # per-tri vector work drops ~42% (r5f A/B). Same algebra
            # and rounding class as classic MT.
            sdx, sdy, sdz = d3s
            px_ = sdy * e2z - sdz * e2y
            py_ = sdz * e2x - sdx * e2z
            pz_ = sdx * e2y - sdy * e2x
            det = e1x * px_ + e1y * py_ + e1z * pz_
            invd = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px_ + ty * py_ + tz * pz_) * invd
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (sdx * qx + sdy * qy + sdz * qz) * invd
            t = (e2x * qx + e2y * qy + e2z * qz) * invd
            ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0))
            return t, u, v, ok
        if MESH_MOMENT and wx is not None:
            # scalar-core derived constants (per-tri, broadcast scalars)
            ngnx = e2y * e1z - e2z * e1y
            ngny = e2z * e1x - e2x * e1z
            ngnz = e2x * e1y - e2y * e1x
            ngk = v0x * ngnx + v0y * ngny + v0z * ngnz
            mux = v0y * e2z - v0z * e2y
            muy = v0z * e2x - v0x * e2z
            muz = v0x * e2y - v0y * e2x
            mvx = e1y * v0z - e1z * v0y
            mvy = e1z * v0x - e1x * v0z
            mvz = e1x * v0y - e1y * v0x
            # vector part: four independent dot chains
            det = dx * ngnx + dy * ngny + dz * ngnz
            u_num = (wx * e2x + wy * e2y + wz * e2z
                     + dx * mux + dy * muy + dz * muz)
            v_num = (dx * mvx + dy * mvy + dz * mvz
                     - (wx * e1x + wy * e1y + wz * e1z))
            t_num = ngk - (ox * ngnx + oy * ngny + oz * ngnz)
            invd = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
            u = u_num * invd
            v = v_num * invd
            t = t_num * invd
            ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0))
            return t, u, v, ok
        px_ = dy * e2z - dz * e2y
        py_ = dz * e2x - dx * e2z
        pz_ = dx * e2y - dy * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        invd = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px_ + ty * py_ + tz * pz_) * invd
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * invd
        t = (e2x * qx + e2y * qy + e2z * qz) * invd
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0))
        return t, u, v, ok

    NSUP = NC // SUPER if NC else 0
    HBM_MESH = ps.mesh_hbm

    G_ROWS, ROWLANE = (_box_layout(N_SUB) if (NC or NINST)
                       else (1, None))

    def _box_enter_row(brow, row, lane, ox, oy, oz, ix, iy, iz, tmin, tfar):
        """Slab test of the AABB stored at (row, lanes lane..lane+5) of a
        (G_ROWS,128) box-table group slice."""
        t0x = (brow[row, lane + 0] - ox) * ix
        t1x = (brow[row, lane + 3] - ox) * ix
        t0y = (brow[row, lane + 1] - oy) * iy
        t1y = (brow[row, lane + 4] - oy) * iy
        t0z = (brow[row, lane + 2] - oz) * iz
        t1z = (brow[row, lane + 5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        return jnp.maximum(tn, tmin) <= jnp.minimum(tf, tfar)

    def _sub_closest(blk, s, ox, oy, oz, dx, dy, dz, tmin, carry,
                     bid=None, w3=None):
        """Unrolled MT closest-hit over sub-block s of a loaded cluster
        block; carry = (t_best, nx, ny, nz, matid[, u, v][, cid]).
        `bid` (traced int32 scalar cluster id, present iff the carry
        ends in a cid vector) tags the winning cluster: cid updates at
        sub-block granularity — if t improved in this unroll, the
        winner lies in this cluster — feeding the wave engine's
        in-kernel sort key (2 VPU ops per sub-block, ~free)."""
        if _PROFILE_SKIP_MT:
            return carry
        if bid is not None:
            carry, cid = carry[:-1], carry[-1]
        if HAS_MESH_UV:
            t_b, nx, ny, nz, mid, mu, mv = carry
        else:
            t_b, nx, ny, nz, mid = carry
        t_in = t_b
        wx, wy, wz = w3 if w3 is not None else (None, None, None)
        for k in range(s * SUB, (s + 1) * SUB):
            t, u, v, okg = _mt_test(blk, k, ox, oy, oz, dx, dy, dz,
                                    wx, wy, wz)
            ok = okg & (t >= tmin) & (t < t_b)
            t_b = jnp.where(ok, t, t_b)
            nx = jnp.where(ok, blk[ROW_N0, k] + u * blk[ROW_D1, k]
                           + v * blk[ROW_D2, k], nx)
            ny = jnp.where(ok, blk[ROW_N0 + 1, k] + u * blk[ROW_D1 + 1, k]
                           + v * blk[ROW_D2 + 1, k], ny)
            nz = jnp.where(ok, blk[ROW_N0 + 2, k] + u * blk[ROW_D1 + 2, k]
                           + v * blk[ROW_D2 + 2, k], nz)
            mid = jnp.where(ok, blk[ROW_MID, k], mid)
            if HAS_MESH_UV:
                mu = jnp.where(ok, blk[ROW_UV0, k]
                               + u * blk[ROW_DUV1, k]
                               + v * blk[ROW_DUV2, k], mu)
                mv = jnp.where(ok, blk[ROW_UV0 + 1, k]
                               + u * blk[ROW_DUV1 + 1, k]
                               + v * blk[ROW_DUV2 + 1, k], mv)
        out = (t_b, nx, ny, nz, mid, mu, mv) if HAS_MESH_UV \
            else (t_b, nx, ny, nz, mid)
        if bid is not None:
            cid = jnp.where(t_b < t_in,
                            jnp.zeros(SHAPE, jnp.int32) + bid, cid)
            out = out + (cid,)
        return out

    def _sub_any(blk, s, ox, oy, oz, dx, dy, dz, tmin, tmax, hf,
                 w3=None, d3s=None):
        """Unrolled MT any-hit over sub-block s; hf is a 0/1 float mask."""
        if _PROFILE_SKIP_MT:
            return hf
        wx, wy, wz = w3 if w3 is not None else (None, None, None)
        for k in range(s * SUB, (s + 1) * SUB):
            t, _, _, okg = _mt_test(blk, k, ox, oy, oz, dx, dy, dz,
                                    wx, wy, wz, d3s=d3s)
            hf = jnp.where(okg & (t >= tmin) & (t <= tmax), 1.0, hf)
        return hf

    def _oct_base(dx, dy, dz, nsup):
        """Box-table section offset for the tile's direction octant
        (lane (0,0): sorted wave tiles share an octant; elsewhere the
        order is a heuristic and correctness-neutral)."""
        def neg(v):
            return (v[0, 0] < 0.0).astype(jnp.int32)
        return (neg(dx) * 4 + neg(dy) * 2 + neg(dz)) * nsup

    def mesh_closest(mref, ox, oy, oz, dx, dy, dz, tmin, carry,
                     nsup=None, root=None, oct=False, want_cid=False):
        """Closest hit over a cluster table, threading a carry of
        (t, nx, ny, nz, matid[, u, v][, cid]). `d` need not be unit
        length — t parameterizes o + t*d, so instanced calls pass
        object-space rays and t stays comparable with world-space hits.
        `want_cid`: the carry ends in an int32 winner-cluster-id vector
        (wave-engine sort key; -1 = no cluster hit).

        Both modes gate on the compact VMEM box table (one (1,128) row
        per super group); geometry blocks are only touched for entered
        groups — loaded from the resident VMEM table, or DMA'd from HBM
        into the scratch buffer in streaming mode (main table only)."""
        hbm_mode = len(mref) == 4
        if hbm_mode:
            hbm, boxr, scr, sem = mref
        else:
            geom, boxr = mref
        if nsup is None:
            nsup = NSUP
        ix, iy, iz = _inv_dir(dx, dy, dz)
        # ray moment w = o x d, once per march call (moment-form test)
        w3 = ((oy * dz - oz * dy, oz * dx - ox * dz,
               ox * dy - oy * dx) if MESH_MOMENT else None)
        base = _oct_base(dx, dy, dz, nsup) if oct else None

        def sup_step(si, carry):
            """One group: load its box rows, enter-test, march if any
            lane enters. Returns (carry, brow) — brow feeds the
            OCT_BREAK bound in the while-march."""
            if oct:
                brow = boxr[pl.ds((base + si) * G_ROWS, G_ROWS), :]
                gi = brow[0, IDX_LANE].astype(jnp.int32)
            else:
                brow = boxr[pl.ds(si * G_ROWS, G_ROWS), :]
                gi = si
            enter = _box_enter_row(brow, 0, 0, ox, oy, oz, ix, iy, iz,
                                   tmin, carry[0])

            def do(carry):
                if hbm_mode:
                    cp = pltpu.make_async_copy(
                        hbm.at[:, pl.ds(gi * (SUPER * CLUSTER),
                                        SUPER * CLUSTER)], scr, sem)
                    cp.start()
                    cp.wait()
                if not MEMBER_FORI:
                    for g in range(SUPER):
                        if hbm_mode:
                            blk = scr[:, g * CLUSTER:(g + 1) * CLUSTER]
                        else:
                            blk = geom[:, pl.ds((gi * SUPER + g) * CLUSTER,
                                                CLUSTER)]
                        bid = (gi * SUPER + g) if want_cid else None
                        for s in range(N_SUB):
                            r_, lane = ROWLANE(g * N_SUB + s)
                            enter_s = _box_enter_row(brow, r_, lane, ox, oy,
                                                     oz, ix, iy, iz, tmin,
                                                     carry[0])
                            carry = jax.lax.cond(
                                jnp.any(enter_s),
                                functools.partial(_sub_closest, blk, s, ox,
                                                  oy, oz, dx, dy, dz, tmin,
                                                  bid=bid, w3=w3),
                                lambda c_: c_, carry)
                    return carry
                # member fori: one MT unroll in the program instead of
                # SUPER*N_SUB — the box tests stay unrolled (tiny code)
                # and collapse to scalar any-lane flags selected by the
                # traced member index
                flags = []
                subflags = []
                for g in range(SUPER):
                    eg = jnp.zeros(SHAPE, bool)
                    row = []
                    for s in range(N_SUB):
                        r_, lane = ROWLANE(g * N_SUB + s)
                        es = _box_enter_row(brow, r_, lane, ox, oy, oz,
                                            ix, iy, iz, tmin, carry[0])
                        if sub_gate:
                            row.append(jnp.any(es))
                        eg = eg | es
                    flags.append(jnp.any(eg))
                    subflags.append(row)

                def member(g, carry):
                    flag = flags[0]
                    for k in range(1, SUPER):
                        flag = jax.lax.select(g == k, flags[k], flag)

                    def hit_blk(carry):
                        if hbm_mode:
                            blk = scr[:, pl.ds(g * CLUSTER, CLUSTER)]
                        else:
                            blk = geom[:, pl.ds((gi * SUPER + g) * CLUSTER,
                                                CLUSTER)]
                        bid = (gi * SUPER + g) if want_cid else None
                        for s in range(N_SUB):
                            if sub_gate:
                                fs = subflags[0][s]
                                for k in range(1, SUPER):
                                    fs = jax.lax.select(g == k,
                                                        subflags[k][s], fs)
                                carry = jax.lax.cond(
                                    fs,
                                    functools.partial(_sub_closest, blk, s,
                                                      ox, oy, oz, dx, dy, dz,
                                                      tmin, bid=bid, w3=w3),
                                    lambda c_: c_, carry)
                            else:
                                carry = _sub_closest(blk, s, ox, oy, oz,
                                                     dx, dy, dz, tmin, carry,
                                                     bid=bid, w3=w3)
                        return carry

                    return jax.lax.cond(flag, hit_blk, lambda c_: c_, carry)

                return jax.lax.fori_loop(0, SUPER, member, carry)

            return (jax.lax.cond(jnp.any(enter), do, lambda c_: c_, carry),
                    brow)

        def sup_body(si, carry):
            return sup_step(si, carry)[0]

        def march(c_, tcap=None, live=None):
            if not (oct and OCT_BREAK and (hbm_mode or OCT_BREAK_VMEM)):
                return jax.lax.fori_loop(0, nsup, sup_body, c_)
            # while-march with early exit (see OCT_BREAK note). Lanes
            # excluded from the bound: parked dead lanes and lanes that
            # miss the root AABB (live mask); missing-but-live lanes are
            # capped at the root exit t (tcap) so they stop blocking the
            # break once the sweep passes the table.
            sxf = 1.0 - 2.0 * (dx[0, 0] < 0.0).astype(jnp.float32)
            syf = 1.0 - 2.0 * (dy[0, 0] < 0.0).astype(jnp.float32)
            szf = 1.0 - 2.0 * (dz[0, 0] < 0.0).astype(jnp.float32)
            sxo = sxf * ox + syf * oy + szf * oz
            pd = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)
            dead = ox > 1e29 if live is None else ~live

            def cond_fn(st):
                return (st[0] < nsup) & (st[1] < 0.5)

            def body_fn(st):
                si, brk0, carry = st
                new_c, brow = sup_step(si, carry)

                def chk(_):
                    tb = new_c[0] if tcap is None \
                        else jnp.minimum(new_c[0], tcap)
                    reach = jnp.max(jnp.where(dead, -3e38,
                                              sxo + tb * pd))
                    return (brow[0, MINPJ_LANE] > reach) \
                        .astype(jnp.float32)

                if BREAK_EVERY > 1:
                    brk = jax.lax.cond(
                        si % BREAK_EVERY == BREAK_EVERY - 1, chk,
                        lambda _: brk0 * 0.0, 0)
                else:
                    brk = chk(0)
                return si + 1, brk, new_c

            st0 = (jnp.int32(0), (ox * 0.0)[0, 0], c_)
            return jax.lax.while_loop(cond_fn, body_fn, st0)[2]

        if root is None:
            return march(carry)
        # root-AABB gate (baked immediates): a tile whose beam misses
        # the whole table skips the march for one slab test — the
        # common case for sorted sky-facing tiles
        rl, rh = root
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum((rl[0] - ox) * ix, (rh[0] - ox) * ix),
                        jnp.minimum((rl[1] - oy) * iy, (rh[1] - oy) * iy)),
            jnp.minimum((rl[2] - oz) * iz, (rh[2] - oz) * iz))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum((rl[0] - ox) * ix, (rh[0] - ox) * ix),
                        jnp.maximum((rl[1] - oy) * iy, (rh[1] - oy) * iy)),
            jnp.maximum((rl[2] - oz) * iz, (rh[2] - oz) * iz))
        enter_root = jnp.maximum(tn, tmin) <= jnp.minimum(tf, carry[0])
        return jax.lax.cond(jnp.any(enter_root),
                            lambda c_: march(c_, tf, enter_root),
                            lambda c_: c_, carry)

    def mesh_any(mref, ox, oy, oz, dx, dy, dz, tmin, tmax, hf0,
                 nsup=None, root=None, oct=False, d3s=None):
        """Any-hit over a cluster table; skips groups/clusters once a
        lane set is fully occluded. hf0 and the return value are 0/1
        float masks — Mosaic cannot carry i1 vectors through scf.for."""
        hbm_mode = len(mref) == 4
        if hbm_mode:
            hbm, boxr, scr, sem = mref
        else:
            geom, boxr = mref
        if nsup is None:
            nsup = NSUP
        ix, iy, iz = _inv_dir(dx, dy, dz)
        # ray moment w = o x d, once per march call (moment-form test)
        w3 = ((oy * dz - oz * dy, oz * dx - ox * dz,
               ox * dy - oy * dx) if MESH_MOMENT else None)
        base = _oct_base(dx, dy, dz, nsup) if oct else None

        def sup_step(si, hf):
            if oct:
                brow = boxr[pl.ds((base + si) * G_ROWS, G_ROWS), :]
                gi = brow[0, IDX_LANE].astype(jnp.int32)
            else:
                brow = boxr[pl.ds(si * G_ROWS, G_ROWS), :]
                gi = si
            enter = _box_enter_row(brow, 0, 0, ox, oy, oz, ix, iy, iz,
                                   tmin, tmax)

            def do(hf):
                if hbm_mode:
                    cp = pltpu.make_async_copy(
                        hbm.at[:, pl.ds(gi * (SUPER * CLUSTER),
                                        SUPER * CLUSTER)], scr, sem)
                    cp.start()
                    cp.wait()
                if not MEMBER_FORI:
                    for g in range(SUPER):
                        if hbm_mode:
                            blk = scr[:, g * CLUSTER:(g + 1) * CLUSTER]
                        else:
                            blk = geom[:, pl.ds((gi * SUPER + g) * CLUSTER,
                                                CLUSTER)]
                        for s in range(N_SUB):
                            r_, lane = ROWLANE(g * N_SUB + s)
                            enter_s = _box_enter_row(brow, r_, lane, ox, oy,
                                                     oz, ix, iy, iz, tmin,
                                                     tmax)
                            hf = jax.lax.cond(
                                jnp.any(enter_s & (hf < 0.5)),
                                functools.partial(_sub_any, blk, s, ox, oy,
                                                  oz, dx, dy, dz, tmin,
                                                  tmax, w3=w3, d3s=d3s),
                                lambda h: h, hf)
                    return hf
                flags = []
                subflags = []
                for g in range(SUPER):
                    eg = jnp.zeros(SHAPE, bool)
                    row = []
                    for s in range(N_SUB):
                        r_, lane = ROWLANE(g * N_SUB + s)
                        es = _box_enter_row(brow, r_, lane, ox, oy, oz,
                                            ix, iy, iz, tmin, tmax)
                        if sub_gate:
                            row.append(jnp.any(es & (hf < 0.5)))
                        eg = eg | es
                    flags.append(jnp.any(eg & (hf < 0.5)))
                    subflags.append(row)

                def member(g, hf):
                    flag = flags[0]
                    for k in range(1, SUPER):
                        flag = jax.lax.select(g == k, flags[k], flag)

                    def hit_blk(hf):
                        if hbm_mode:
                            blk = scr[:, pl.ds(g * CLUSTER, CLUSTER)]
                        else:
                            blk = geom[:, pl.ds((gi * SUPER + g) * CLUSTER,
                                                CLUSTER)]
                        for s in range(N_SUB):
                            if sub_gate:
                                fs = subflags[0][s]
                                for k in range(1, SUPER):
                                    fs = jax.lax.select(g == k,
                                                        subflags[k][s], fs)
                                hf = jax.lax.cond(
                                    fs,
                                    functools.partial(_sub_any, blk, s, ox,
                                                      oy, oz, dx, dy, dz,
                                                      tmin, tmax, w3=w3,
                                                      d3s=d3s),
                                    lambda h: h, hf)
                            else:
                                hf = _sub_any(blk, s, ox, oy, oz, dx, dy, dz,
                                              tmin, tmax, hf, w3=w3,
                                              d3s=d3s)
                        return hf

                    return jax.lax.cond(flag, hit_blk, lambda h: h, hf)

                return jax.lax.fori_loop(0, SUPER, member, hf)

            return (jax.lax.cond(jnp.any(enter & (hf < 0.5)), do,
                                 lambda h: h, hf), brow)

        def sup_body(si, hf):
            return sup_step(si, hf)[0]

        def march(h_, tcap=None, live=None):
            if not (oct and OCT_BREAK_ANY
                    and (hbm_mode or OCT_BREAK_VMEM)):
                return jax.lax.fori_loop(0, nsup, sup_body, h_)
            # while-march with early exit (see OCT_BREAK note). A lane
            # drops out of the bound once occluded (hf=1), so the
            # all-occluded tile breaks immediately (reach = -inf).
            sxf = 1.0 - 2.0 * (dx[0, 0] < 0.0).astype(jnp.float32)
            syf = 1.0 - 2.0 * (dy[0, 0] < 0.0).astype(jnp.float32)
            szf = 1.0 - 2.0 * (dz[0, 0] < 0.0).astype(jnp.float32)
            sxo = sxf * ox + syf * oy + szf * oz
            pd = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)
            dead = ox > 1e29 if live is None else ~live
            tb = tmax if tcap is None else jnp.minimum(tmax, tcap)

            def cond_fn(st):
                return (st[0] < nsup) & (st[1] < 0.5)

            def body_fn(st):
                si, _, hf = st
                new_h, brow = sup_step(si, hf)
                reach = jnp.max(jnp.where(dead | (new_h > 0.5), -3e38,
                                          sxo + tb * pd))
                brk = (brow[0, MINPJ_LANE] > reach).astype(jnp.float32)
                return si + 1, brk, new_h

            st0 = (jnp.int32(0), (ox * 0.0)[0, 0], h_)
            return jax.lax.while_loop(cond_fn, body_fn, st0)[2]

        if root is None:
            return march(hf0)
        rl, rh = root
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum((rl[0] - ox) * ix, (rh[0] - ox) * ix),
                        jnp.minimum((rl[1] - oy) * iy, (rh[1] - oy) * iy)),
            jnp.minimum((rl[2] - oz) * iz, (rh[2] - oz) * iz))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum((rl[0] - ox) * ix, (rh[0] - ox) * ix),
                        jnp.maximum((rl[1] - oy) * iy, (rh[1] - oy) * iy)),
            jnp.maximum((rl[2] - oz) * iz, (rh[2] - oz) * iz))
        enter_root = (jnp.maximum(tn, tmin) <= jnp.minimum(tf, tmax)) \
            & (hf0 < 0.5)
        return jax.lax.cond(jnp.any(enter_root),
                            lambda h_: march(h_, tf, enter_root),
                            lambda h_: h_, hf0)

    # ---- sphere table march (module SPH_* constants; non-emissive
    # uniform-scale spheres in Morton-ordered 128-slot blocks). World
    # rays only (d unit by construction everywhere trace_* is called),
    # so the quadratic's a == 1. The reference serves any sphere count
    # from one shared unit-sphere BLAS (main.rs:2437-2590); this is the
    # TPU equivalent: per block ONE slab test, then 128 unrolled
    # analytic tests with scalar-broadcast center/radius/matid.
    N_SPH = ps.n_sph_blocks
    _sref_hold = []  # set by the kernel entry (megakernel + wave)

    def _sph_blk_enter(blk, ox, oy, oz, ix, iy, iz, tmin, tfar):
        t0x = (blk[SPH_ROW_BOX, 0] - ox) * ix
        t1x = (blk[SPH_ROW_BOX, 3] - ox) * ix
        t0y = (blk[SPH_ROW_BOX, 1] - oy) * iy
        t1y = (blk[SPH_ROW_BOX, 4] - oy) * iy
        t0z = (blk[SPH_ROW_BOX, 2] - oz) * iz
        t1z = (blk[SPH_ROW_BOX, 5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        return jnp.maximum(tn, tmin) <= jnp.minimum(tf, tfar)

    def _sph_test(blk, k, ox, oy, oz, dx, dy, dz, tmin):
        """(t, ok, invr, cx, cy, cz) for sphere slot k (BIG on miss)."""
        cx, cy, cz, rr = blk[0, k], blk[1, k], blk[2, k], blk[3, k]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        hb = ocx * dx + ocy * dy + ocz * dz
        c2 = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
        disc = hb * hb - c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r0 = -hb - sq
        r1 = -hb + sq
        t = jnp.where(r0 >= tmin, r0, jnp.where(r1 >= tmin, r1, BIG))
        ok = (disc >= 0.0) & (rr > 0.0)
        return t, ok, 1.0 / jnp.where(rr > 0.0, rr, 1.0), cx, cy, cz

    def sphere_closest(sref, ox, oy, oz, dx, dy, dz, tmin, carry):
        """carry = (t_best, nx, ny, nz, matid); matid -1 = no table hit.
        Normal = (hit - center)/r (uniform scale: W2O^T folds away)."""
        ix, iy, iz = _inv_dir(dx, dy, dz)

        def blk_body(b, carry):
            blk = sref[:, pl.ds(b * SPH_BLOCK, SPH_BLOCK)]
            enter = _sph_blk_enter(blk, ox, oy, oz, ix, iy, iz, tmin,
                                   carry[0])

            def do(carry):
                t_b, nx, ny, nz, mid = carry
                for k in range(SPH_BLOCK):
                    t, okg, invr, cx, cy, cz = _sph_test(
                        blk, k, ox, oy, oz, dx, dy, dz, tmin)
                    ok = okg & (t < t_b)
                    t_b = jnp.where(ok, t, t_b)
                    nx = jnp.where(ok, (ox + t * dx - cx) * invr, nx)
                    ny = jnp.where(ok, (oy + t * dy - cy) * invr, ny)
                    nz = jnp.where(ok, (oz + t * dz - cz) * invr, nz)
                    mid = jnp.where(ok, blk[4, k], mid)
                return t_b, nx, ny, nz, mid

            return jax.lax.cond(jnp.any(enter), do, lambda c_: c_, carry)

        return jax.lax.fori_loop(0, N_SPH, blk_body, carry)

    def sphere_any(sref, ox, oy, oz, dx, dy, dz, tmin, tmax, hf):
        """Any-hit over the sphere table; hf is a 0/1 float mask."""
        ix, iy, iz = _inv_dir(dx, dy, dz)

        def blk_body(b, hf):
            blk = sref[:, pl.ds(b * SPH_BLOCK, SPH_BLOCK)]
            enter = _sph_blk_enter(blk, ox, oy, oz, ix, iy, iz, tmin,
                                   tmax)

            def do(hf):
                for k in range(SPH_BLOCK):
                    t, okg, _, _, _, _ = _sph_test(
                        blk, k, ox, oy, oz, dx, dy, dz, tmin)
                    hf = jnp.where(okg & (t <= tmax), 1.0, hf)
                return hf

            return jax.lax.cond(jnp.any(enter & (hf < 0.5)), do,
                                lambda h: h, hf)

        return jax.lax.fori_loop(0, N_SPH, blk_body, hf)

    # ---- distant-light fold: unrolled constants up to MAX_LIGHTS,
    # VMEM light-table fori beyond (one light per row; dynamic row
    # slices with static in-slice reads — the instance-table pattern)
    NLIGHTS = len(ps.lights)
    LIGHT_TABLE = ps.light_table is not None
    # constant-direction shadow specialization (RENE_CONST_DIR=0 is the
    # A/B fallback): distant-light occlusion rays share one direction
    # across the tile, so the d-only factors of every test run on the
    # scalar core (see _mt_test d3s)
    CONST_DIR = os.environ.get("RENE_CONST_DIR", "1") != "0"
    _lref_hold = []  # set by the kernel entry (megakernel + wave)

    def fold_lights(carry, body):
        """carry -> body(carry, (ldx, ldy, ldz, lcr, lcg, lcb)) over
        every distant light. Scalars are python constants in the
        unrolled path (byte-stable with earlier builds) or traced row
        reads in table mode."""
        if not LIGHT_TABLE:
            for lt in ps.lights:
                carry = body(carry, lt["dir"] + lt["color"])
            return carry
        lref = _lref_hold[0]

        def lbody(li, carry):
            row = lref[pl.ds(li, 1), :]
            return body(carry, tuple(row[0, k] for k in range(6)))

        return jax.lax.fori_loop(0, NLIGHTS, lbody, carry)

    def _apply_rec_texs(rec, uu, vv, vals):
        """Per-hit texture-slot values of a record: checkers evaluate
        inline from uv; image slots publish (base,w,h) descriptor rows
        fetched once post-trace (apply_images). Every active class gets
        a default so stale lanes reset. uu=None -> descriptor-row
        defaults only (mesh tables without uv rows carry no texs)."""
        texs = rec.get("texs", {}) if uu is not None else {}
        opv = None
        for cls, d in texs.items():
            if cls not in IMG_CLASSES:
                continue
            if d[0] == "checker":
                xs = uu * d[1]
                ys = vv * d[2]
                even = ((xs - 2.0 * jnp.floor(0.5 * xs) < 1.0)
                        == (ys - 2.0 * jnp.floor(0.5 * ys) < 1.0))
                v = tuple(jnp.where(even, d[3][ch], d[4][ch])
                          for ch in range(3))
                if cls == "kd":
                    vals["abr"], vals["abg"], vals["abb"] = v
                elif cls == "ks":
                    vals["kr"], vals["kg"], vals["kb"] = v
                elif cls == "ru":
                    vals["ax"] = v[0]
                elif cls == "rv":
                    vals["ay"] = v[0]
                elif cls == "kr":
                    vals["krr"], vals["krg"], vals["krb"] = v
                elif cls == "kt":
                    vals["ktr"], vals["ktg"], vals["ktb"] = v
                elif cls == "op":
                    opv = v
            else:
                vals[f"ib_{cls}"] = float(d[1])
                vals[f"iw_{cls}"] = float(d[2])
                vals[f"ih_{cls}"] = float(d[3])
        if opv is not None:
            # checker opacity: op = 1-v; v multiplies the op-less
            # kr2/kt2 bases (material.rs:578-630 products, per hit)
            vals["opr"] = 1.0 - opv[0]
            vals["opg"] = 1.0 - opv[1]
            vals["opb"] = 1.0 - opv[2]
            for ch, keys in enumerate((("krr", "ktr"), ("krg", "ktg"),
                                       ("krb", "ktb"))):
                for key in keys:
                    vals[key] = opv[ch] * vals[key]
        if HAS_IMG_MATS:
            if uu is not None:
                vals["u"] = uu
                vals["v"] = vv
            for c in ACTIVE_IMG_CLASSES:
                vals.setdefault(f"ib_{c}", -1.0)
                vals.setdefault(f"iw_{c}", 0.0)
                vals.setdefault(f"ih_{c}", 0.0)
            if HAS_RRM:
                vals["rrm"] = 1.0 if rec.get("rrm") else 0.0
        if HAS_MSCALE:
            fs = rec.get("fscale", (1.0, 1.0, 1.0))
            vals["msr"], vals["msg"], vals["msb"] = fs
        return vals

    # ---- closest hit: unrolled over primitives; returns t + shading record
    def trace_closest(ox, oy, oz, dx, dy, dz, tmin, mref=None,
                      want_cid=False):
        """want_cid=True additionally returns the winning CLUSTER id
        (int32, -1 for immediate/sphere hits and misses; instanced
        meshes get disjoint id ranges per instance) — the wave engine's
        surface-adaptive origin bin for its in-kernel sort key."""
        wx = oy * dz - oz * dy
        wy = oz * dx - ox * dz
        wz = ox * dy - oy * dx
        t_best = jnp.full(SHAPE, BIG)
        # select-accumulated shading attributes (invariant selects are
        # elided at build time — _LazyAttr docstring; defaults here are
        # what the eager chain leaves on miss lanes)
        defaults = {k: 0.0 for k in
                    ("nx", "ny", "nz", "alr", "alg", "alb",
                     "abr", "abg", "abb", "etar", "etag", "etab",
                     "kr", "kg", "kb", "ax", "ay", "ir", "mat")}
        if VOL:
            defaults["imed"] = 0.0
            defaults["emed"] = 0.0
        if HAS_UBER:
            for k in ("opr", "opg", "opb", "krr", "krg", "krb",
                      "ktr", "ktg", "ktb"):
                defaults[k] = 0.0
        if HAS_IMG_MATS:
            defaults["u"] = 0.0
            defaults["v"] = 0.0
            for c in ACTIVE_IMG_CLASSES:
                defaults[f"ib_{c}"] = -1.0
                defaults[f"iw_{c}"] = 0.0
                defaults[f"ih_{c}"] = 0.0
            if HAS_RRM:
                defaults["rrm"] = 0.0
        if HAS_MSCALE:
            for key in ("msr", "msg", "msb"):
                defaults[key] = 1.0
        la = _LazyAttr(defaults, ox * 0.0, eager=not ATTR_ELIDE)

        # quads run FIRST: they are never emissive, so their 0-valued
        # emission writes stay symbolic instead of re-selecting 0 after
        # an emissive tri materializes alr/alg/alb (order between prim
        # kinds only moves degenerate exact-t ties)
        for rec in ps.quads:
            dn = dot3(dx, dy, dz, *rec["pn"])
            t = (rec["pk"] - dot3(ox, oy, oz, *rec["pn"])) \
                / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
            hx = ox + t * dx - rec["qa"][0]
            hy = oy + t * dy - rec["qa"][1]
            hz = oz + t * dz - rec["qa"][2]
            uq = dot3(hx, hy, hz, *rec["du"])
            vq = dot3(hx, hy, hz, *rec["dv"])
            ok = ((jnp.abs(dn) > 1e-12) & (t >= tmin) & (t < t_best)
                  & (uq >= 0.0) & (uq <= 1.0)
                  & (vq >= 0.0) & (vq <= 1.0))
            t_best = jnp.where(ok, t, t_best)
            if rec.get("texs") or HAS_IMG_MATS:
                uu = (rec["uva"][0] + uq * rec["duv1"][0]
                      + vq * rec["duv2"][0])
                vv = (rec["uva"][1] + uq * rec["duv1"][1]
                      + vq * rec["duv2"][1])
            else:
                uu = vv = None
            vals = {"nx": rec["n"][0], "ny": rec["n"][1],
                    "nz": rec["n"][2],
                    "alr": 0.0, "alg": 0.0, "alb": 0.0,  # never emissive
                    "abr": rec["albedo"][0], "abg": rec["albedo"][1],
                    "abb": rec["albedo"][2],
                    "etar": rec["eta"][0], "etag": rec["eta"][1],
                    "etab": rec["eta"][2],
                    "kr": rec["k"][0], "kg": rec["k"][1],
                    "kb": rec["k"][2],
                    "ax": rec["alpha"][0], "ay": rec["alpha"][1],
                    "ir": rec["ir"], "mat": float(rec["mat_type"])}
            if VOL:
                vals["imed"] = float(rec["imed"])
                vals["emed"] = float(rec["emed"])
            if HAS_UBER:
                vals.update(opr=rec["op"][0], opg=rec["op"][1],
                            opb=rec["op"][2], krr=rec["kr2"][0],
                            krg=rec["kr2"][1], krb=rec["kr2"][2],
                            ktr=rec["kt2"][0], ktg=rec["kt2"][1],
                            ktb=rec["kt2"][2])
            vals = _apply_rec_texs(rec, uu, vv, vals)
            la.update(ok, vals)

        for rec in ps.tris:
            s0 = (dot3(dx, dy, dz, *rec["m0"]) + dot3(wx, wy, wz, *rec["e0"]))
            s1 = (dot3(dx, dy, dz, *rec["m1"]) + dot3(wx, wy, wz, *rec["e1"]))
            s2 = (dot3(dx, dy, dz, *rec["m2"]) + dot3(wx, wy, wz, *rec["e2"]))
            hit_side = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | \
                       ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
            dn = dot3(dx, dy, dz, *rec["pn"])
            t = (rec["pk"] - dot3(ox, oy, oz, *rec["pn"])) \
                / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
            ok = hit_side & (jnp.abs(dn) > 1e-12) & (t >= tmin) & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            # barycentric normal interpolation from side values
            denom = s0 + s1 + s2
            denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
            bu = s2 / denom
            bv = s0 / denom
            w0 = 1.0 - bu - bv
            nx = w0 * rec["n0"][0] + bu * rec["n1"][0] + bv * rec["n2"][0]
            ny = w0 * rec["n0"][1] + bu * rec["n1"][1] + bv * rec["n2"][1]
            nz = w0 * rec["n0"][2] + bu * rec["n1"][2] + bv * rec["n2"][2]
            if rec.get("texs") or HAS_IMG_MATS:
                uu = (w0 * rec["uv0"][0] + bu * rec["uv1"][0]
                      + bv * rec["uv2"][0])
                vv = (w0 * rec["uv0"][1] + bu * rec["uv1"][1]
                      + bv * rec["uv2"][1])
            else:
                uu = vv = None
            vals = {"nx": nx, "ny": ny, "nz": nz,
                    "alr": rec["emit"][0] if rec["emissive"] else 0.0,
                    "alg": rec["emit"][1] if rec["emissive"] else 0.0,
                    "alb": rec["emit"][2] if rec["emissive"] else 0.0,
                    "abr": rec["albedo"][0], "abg": rec["albedo"][1],
                    "abb": rec["albedo"][2],
                    "etar": rec["eta"][0], "etag": rec["eta"][1],
                    "etab": rec["eta"][2],
                    "kr": rec["k"][0], "kg": rec["k"][1], "kb": rec["k"][2],
                    "ax": rec["alpha"][0], "ay": rec["alpha"][1],
                    "ir": rec["ir"], "mat": float(rec["mat_type"])}
            if VOL:
                vals["imed"] = float(rec["imed"])
                vals["emed"] = float(rec["emed"])
            if HAS_UBER:
                vals.update(opr=rec["op"][0], opg=rec["op"][1],
                            opb=rec["op"][2], krr=rec["kr2"][0],
                            krg=rec["kr2"][1], krb=rec["kr2"][2],
                            ktr=rec["kt2"][0], ktg=rec["kt2"][1],
                            ktb=rec["kt2"][2])
            vals = _apply_rec_texs(rec, uu, vv, vals)
            la.update(ok, vals)

        for rec in ps.spheres:
            m = rec["w2o"]
            lox = m[0][0] * ox + m[0][1] * oy + m[0][2] * oz + m[0][3]
            loy = m[1][0] * ox + m[1][1] * oy + m[1][2] * oz + m[1][3]
            loz = m[2][0] * ox + m[2][1] * oy + m[2][2] * oz + m[2][3]
            ldx = m[0][0] * dx + m[0][1] * dy + m[0][2] * dz
            ldy = m[1][0] * dx + m[1][1] * dy + m[1][2] * dz
            ldz = m[2][0] * dx + m[2][1] * dy + m[2][2] * dz
            a = ldx * ldx + ldy * ldy + ldz * ldz
            half_b = lox * ldx + loy * ldy + loz * ldz
            c = lox * lox + loy * loy + loz * loz - 1.0
            disc = half_b * half_b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / jnp.maximum(a, 1e-20)
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            okd = disc >= 0.0
            r0ok = okd & (r0 >= tmin)
            r1ok = okd & (r1 >= tmin)
            t = jnp.where(r0ok, r0, jnp.where(r1ok, r1, BIG))
            ok = t < t_best
            t_best = jnp.where(ok, t, t_best)
            # object hit point + W2O^T normal (lib.rs:852-881)
            px_ = lox + t * ldx
            py_ = loy + t * ldy
            pz_ = loz + t * ldz
            nx = m[0][0] * px_ + m[1][0] * py_ + m[2][0] * pz_
            ny = m[0][1] * px_ + m[1][1] * py_ + m[2][1] * pz_
            nz = m[0][2] * px_ + m[1][2] * py_ + m[2][2] * pz_
            if rec.get("texs") or HAS_IMG_MATS:
                # spherical uv from the object-space hit (lib.rs:874-880)
                uu, vv = sphere_uv_of(px_, py_, pz_)
            else:
                uu = vv = None
            vals = {"nx": nx, "ny": ny, "nz": nz,
                    "alr": rec["emit"][0] if rec["emissive"] else 0.0,
                    "alg": rec["emit"][1] if rec["emissive"] else 0.0,
                    "alb": rec["emit"][2] if rec["emissive"] else 0.0,
                    "abr": rec["albedo"][0], "abg": rec["albedo"][1],
                    "abb": rec["albedo"][2],
                    "etar": rec["eta"][0], "etag": rec["eta"][1],
                    "etab": rec["eta"][2],
                    "kr": rec["k"][0], "kg": rec["k"][1], "kb": rec["k"][2],
                    "ax": rec["alpha"][0], "ay": rec["alpha"][1],
                    "ir": rec["ir"], "mat": float(rec["mat_type"])}
            if VOL:
                vals["imed"] = float(rec["imed"])
                vals["emed"] = float(rec["emed"])
            if HAS_UBER:
                vals.update(opr=rec["op"][0], opg=rec["op"][1],
                            opb=rec["op"][2], krr=rec["kr2"][0],
                            krg=rec["kr2"][1], krb=rec["kr2"][2],
                            ktr=rec["kt2"][0], ktg=rec["kt2"][1],
                            ktb=rec["kt2"][2])
            vals = _apply_rec_texs(rec, uu, vv, vals)
            la.update(ok, vals)

        # materialize: miss lanes get the engine defaults back, so the
        # elided chain is bit-identical to the eager one (lanes a mesh
        # later wins are overwritten below exactly as before)
        attr = la.finalize(t_best < BIG)

        cid = (ox * 0.0).astype(jnp.int32) - 1 if want_cid else None
        if NC or NINST:
            main_ref, inst_refs = mref
            zero = ox * 0.0
            mres = (t_best, zero, zero, zero, zero - 1.0)
            if HAS_MESH_UV:
                mres = mres + (zero, zero)
            if want_cid:
                mres = mres + (cid,)
            if NC:
                mres = mesh_closest(main_ref, ox, oy, oz, dx, dy, dz,
                                    tmin, mres, root=ps.mesh_root,
                                    oct=ps.mesh_oct, want_cid=want_cid)
            cid_base = (NSUP * SUPER) if NC else 0
            for (gref, bref, itref), im in zip(inst_refs, INST_MESHES):
                nsup_b = im["n_clusters"] // SUPER
                inst_cb = cid_base
                cid_base += im["n_inst"] * nsup_b * SUPER

                def inst_body(ii, carry, gref=gref, bref=bref,
                              itref=itref, nsup_b=nsup_b,
                              inst_cb=inst_cb):
                    row = itref[pl.ds(ii, 1), :]
                    mm = [row[0, k] for k in range(12)]
                    slot = row[0, 12]
                    lox = mm[0] * ox + mm[1] * oy + mm[2] * oz + mm[3]
                    loy = mm[4] * ox + mm[5] * oy + mm[6] * oz + mm[7]
                    loz = mm[8] * ox + mm[9] * oy + mm[10] * oz + mm[11]
                    ldx = mm[0] * dx + mm[1] * dy + mm[2] * dz
                    ldy = mm[4] * dx + mm[5] * dy + mm[6] * dz
                    ldz = mm[8] * dx + mm[9] * dy + mm[10] * dz
                    t_pre = carry[0]
                    if want_cid:
                        # inner march writes LOCAL cluster ids on
                        # improvement; remap winners to this mesh's
                        # per-instance global range
                        cid_prev = carry[-1]
                        carry = carry[:-1] + (cid_prev * 0 - 1,)
                    res = mesh_closest((gref, bref), lox, loy, loz,
                                       ldx, ldy, ldz, tmin, carry,
                                       nsup_b, root=im["root"],
                                       oct=im.get("oct", False),
                                       want_cid=want_cid)
                    won = res[0] < t_pre
                    # world normal = W2O^T n_obj (lib.rs:852-881)
                    nwx = mm[0] * res[1] + mm[4] * res[2] + mm[8] * res[3]
                    nwy = mm[1] * res[1] + mm[5] * res[2] + mm[9] * res[3]
                    nwz = mm[2] * res[1] + mm[6] * res[2] + mm[10] * res[3]
                    out = (res[0],
                           jnp.where(won, nwx, carry[1]),
                           jnp.where(won, nwy, carry[2]),
                           jnp.where(won, nwz, carry[3]),
                           jnp.where(won, slot + ox * 0.0, carry[4]))
                    if HAS_MESH_UV:
                        out = out + (jnp.where(won, res[5], carry[5]),
                                     jnp.where(won, res[6], carry[6]))
                    if want_cid:
                        gcid = res[-1] + (inst_cb
                                          + ii * (nsup_b * SUPER))
                        out = out + (jnp.where(won, gcid, cid_prev),)
                    return out

                mres = jax.lax.fori_loop(0, im["n_inst"], inst_body,
                                         mres)
            tm, mnx, mny, mnz, mid = mres[:5]
            if HAS_MESH_UV:
                mu, mv = mres[5], mres[6]
            if want_cid:
                cid = mres[-1]  # >=0 iff a cluster mesh won the trace
            win = tm < t_best
            t_best = jnp.where(win, tm, t_best)
            attr["nx"] = jnp.where(win, mnx, attr["nx"])
            attr["ny"] = jnp.where(win, mny, attr["ny"])
            attr["nz"] = jnp.where(win, mnz, attr["nz"])
            for key in ("alr", "alg", "alb"):  # mesh tris are non-emissive
                attr[key] = jnp.where(win, 0.0, attr[key])
            for mi, rec in enumerate(ps.mesh_mats):
                sel = win & (mid == float(mi))
                vals = {"abr": rec["albedo"][0], "abg": rec["albedo"][1],
                        "abb": rec["albedo"][2],
                        "etar": rec["eta"][0], "etag": rec["eta"][1],
                        "etab": rec["eta"][2],
                        "kr": rec["k"][0], "kg": rec["k"][1],
                        "kb": rec["k"][2],
                        "ax": rec["alpha"][0], "ay": rec["alpha"][1],
                        "ir": rec["ir"], "mat": float(rec["mat_type"])}
                if VOL:
                    vals["imed"] = float(rec["imed"])
                    vals["emed"] = float(rec["emed"])
                if HAS_UBER:
                    vals.update(opr=rec["op"][0], opg=rec["op"][1],
                                opb=rec["op"][2], krr=rec["kr2"][0],
                                krg=rec["kr2"][1], krb=rec["kr2"][2],
                                ktr=rec["kt2"][0], ktg=rec["kt2"][1],
                                ktb=rec["kt2"][2])
                # mesh tables without uv rows guarantee solid mesh mats
                vals = _apply_rec_texs(
                    rec, mu if HAS_MESH_UV else None,
                    mv if HAS_MESH_UV else None, vals)
                for key, val in vals.items():
                    attr[key] = jnp.where(sel, val, attr[key])

        if N_SPH:
            zero = ox * 0.0
            ts, snx, sny, snz, smid = sphere_closest(
                _sref_hold[0], ox, oy, oz, dx, dy, dz, tmin,
                (t_best, zero, zero, zero, zero - 1.0))
            win = ts < t_best
            t_best = jnp.where(win, ts, t_best)
            attr["nx"] = jnp.where(win, snx, attr["nx"])
            attr["ny"] = jnp.where(win, sny, attr["ny"])
            attr["nz"] = jnp.where(win, snz, attr["nz"])
            for key in ("alr", "alg", "alb"):  # table spheres: never emissive
                attr[key] = jnp.where(win, 0.0, attr[key])
            for mi, rec in enumerate(ps.sph_mats):
                sel = win & (smid == float(mi))
                vals = {"abr": rec["albedo"][0], "abg": rec["albedo"][1],
                        "abb": rec["albedo"][2],
                        "etar": rec["eta"][0], "etag": rec["eta"][1],
                        "etab": rec["eta"][2],
                        "kr": rec["k"][0], "kg": rec["k"][1],
                        "kb": rec["k"][2],
                        "ax": rec["alpha"][0], "ay": rec["alpha"][1],
                        "ir": rec["ir"], "mat": float(rec["mat_type"])}
                if VOL:
                    vals["imed"] = float(rec["imed"])
                    vals["emed"] = float(rec["emed"])
                if HAS_UBER:
                    vals.update(opr=rec["op"][0], opg=rec["op"][1],
                                opb=rec["op"][2], krr=rec["kr2"][0],
                                krg=rec["kr2"][1], krb=rec["kr2"][2],
                                ktr=rec["kt2"][0], ktg=rec["kt2"][1],
                                ktb=rec["kt2"][2])
                # table spheres are solid-material by construction
                vals = _apply_rec_texs(rec, None, None, vals)
                for key, val in vals.items():
                    attr[key] = jnp.where(sel, val, attr[key])
            if want_cid:
                cid = jnp.where(win, cid * 0 - 1, cid)

        if want_cid:
            return t_best, attr, cid
        return t_best, attr

    # ---- occlusion: any hit below tmax
    def trace_any(ox, oy, oz, dx, dy, dz, tmin, tmax, mref=None,
                  dir_scalars=None):
        """dir_scalars: the SCALAR (ldx, ldy, ldz) when every lane
        shares one direction (distant-light shadows) — d-only dot
        products and the MT p/det/invd collapse to scalar-core ops
        (python constants in the unrolled-lights path)."""
        ds = dir_scalars

        def ddot(c3):
            if ds is not None:
                return ds[0] * c3[0] + ds[1] * c3[1] + ds[2] * c3[2]
            return dot3(dx, dy, dz, *c3)

        wx = oy * dz - oz * dy
        wy = oz * dx - ox * dz
        wz = ox * dy - oy * dx
        hit = jnp.zeros(SHAPE, bool)
        for rec in ps.tris:
            s0 = (ddot(rec["m0"]) + dot3(wx, wy, wz, *rec["e0"]))
            s1 = (ddot(rec["m1"]) + dot3(wx, wy, wz, *rec["e1"]))
            s2 = (ddot(rec["m2"]) + dot3(wx, wy, wz, *rec["e2"]))
            side = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | \
                   ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
            dn = ddot(rec["pn"])
            t = (rec["pk"] - dot3(ox, oy, oz, *rec["pn"])) \
                / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
            hit = hit | (side & (jnp.abs(dn) > 1e-12) & (t >= tmin)
                         & (t <= tmax))
        for rec in ps.quads:
            dn = ddot(rec["pn"])
            t = (rec["pk"] - dot3(ox, oy, oz, *rec["pn"])) \
                / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
            hx = ox + t * dx - rec["qa"][0]
            hy = oy + t * dy - rec["qa"][1]
            hz = oz + t * dz - rec["qa"][2]
            uq = dot3(hx, hy, hz, *rec["du"])
            vq = dot3(hx, hy, hz, *rec["dv"])
            hit = hit | ((jnp.abs(dn) > 1e-12) & (t >= tmin)
                         & (t <= tmax) & (uq >= 0.0) & (uq <= 1.0)
                         & (vq >= 0.0) & (vq <= 1.0))
        for rec in ps.spheres:
            m = rec["w2o"]
            lox = m[0][0] * ox + m[0][1] * oy + m[0][2] * oz + m[0][3]
            loy = m[1][0] * ox + m[1][1] * oy + m[1][2] * oz + m[1][3]
            loz = m[2][0] * ox + m[2][1] * oy + m[2][2] * oz + m[2][3]
            ldx = m[0][0] * dx + m[0][1] * dy + m[0][2] * dz
            ldy = m[1][0] * dx + m[1][1] * dy + m[1][2] * dz
            ldz = m[2][0] * dx + m[2][1] * dy + m[2][2] * dz
            a = ldx * ldx + ldy * ldy + ldz * ldz
            half_b = lox * ldx + loy * ldy + loz * ldz
            c = lox * lox + loy * loy + loz * loz - 1.0
            disc = half_b * half_b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / jnp.maximum(a, 1e-20)
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            okd = disc >= 0.0
            t = jnp.where(okd & (r0 >= tmin), r0,
                          jnp.where(okd & (r1 >= tmin), r1, BIG))
            hit = hit | (t <= tmax)
        if NC or NINST:
            main_ref, inst_refs = mref
            hf = jnp.where(hit, ox * 0.0 + 1.0, ox * 0.0)
            if NC:
                # NOTE: the const-dir d3s specialization is NOT passed
                # into the cluster march — r5f F0/F1 measured the
                # scalar p/det/invd chain SERIALIZING the 128-tri
                # unroll (dragon @720p 0.0814 -> 0.1030, -27%); the
                # win is real only where the d-factors fold to python
                # constants at trace time (immediates: F2 +6%, F4 +4%)
                hf = mesh_any(main_ref, ox, oy, oz, dx, dy, dz, tmin,
                              tmax, hf, root=ps.mesh_root,
                              oct=ps.mesh_oct)
            for (gref, bref, itref), im in zip(inst_refs, INST_MESHES):
                nsup_b = im["n_clusters"] // SUPER

                def any_body(ii, hf, gref=gref, bref=bref, itref=itref,
                             nsup_b=nsup_b):
                    row = itref[pl.ds(ii, 1), :]
                    mm = [row[0, k] for k in range(12)]
                    lox = mm[0] * ox + mm[1] * oy + mm[2] * oz + mm[3]
                    loy = mm[4] * ox + mm[5] * oy + mm[6] * oz + mm[7]
                    loz = mm[8] * ox + mm[9] * oy + mm[10] * oz + mm[11]
                    ldx = mm[0] * dx + mm[1] * dy + mm[2] * dz
                    ldy = mm[4] * dx + mm[5] * dy + mm[6] * dz
                    ldz = mm[8] * dx + mm[9] * dy + mm[10] * dz
                    return mesh_any((gref, bref), lox, loy, loz,
                                    ldx, ldy, ldz, tmin, tmax, hf,
                                    nsup_b, root=im["root"],
                                    oct=im.get("oct", False))

                hf = jax.lax.fori_loop(0, im["n_inst"], any_body, hf)
            hit = hf > 0.5
        if N_SPH and os.environ.get("RENE_SPH_ANY", "1") != "0":
            hf = jnp.where(hit, ox * 0.0 + 1.0, ox * 0.0)
            hf = sphere_any(_sref_hold[0], ox, oy, oz, dx, dy, dz,
                            tmin, tmax, hf)
            hit = hf > 0.5
        return hit

    # ---- emissive-only pdf trace (lib.rs:964-1066)
    def trace_emit_pdf(ox, oy, oz, dx, dy, dz):
        wx = oy * dz - oz * dy
        wy = oz * dx - ox * dz
        wz = ox * dy - oy * dx
        ndx, ndy, ndz = normalize3(dx, dy, dz)
        t_best = jnp.full(SHAPE, BIG)
        pdf = jnp.zeros(SHAPE)
        for rec in ps.tris:
            if not rec["emissive"]:
                continue
            s0 = (dot3(dx, dy, dz, *rec["m0"]) + dot3(wx, wy, wz, *rec["e0"]))
            s1 = (dot3(dx, dy, dz, *rec["m1"]) + dot3(wx, wy, wz, *rec["e1"]))
            s2 = (dot3(dx, dy, dz, *rec["m2"]) + dot3(wx, wy, wz, *rec["e2"]))
            side = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | \
                   ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
            dn = dot3(dx, dy, dz, *rec["pn"])
            t = (rec["pk"] - dot3(ox, oy, oz, *rec["pn"])) \
                / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
            ok = side & (jnp.abs(dn) > 1e-12) & (t >= TMIN) & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            dist2 = t * t * (dx * dx + dy * dy + dz * dz)
            cosine = jnp.abs(dot3(ndx, ndy, ndz, *rec["gn_unit"]))
            p = dist2 / jnp.maximum(cosine * rec["area"], 1e-20) \
                / float(rec["prim_count"])
            pdf = jnp.where(ok, p, pdf)
        for rec in ps.spheres:
            if not rec["emissive"]:
                continue
            m = rec["w2o"]
            o2w = rec["o2w"]
            lox = m[0][0] * ox + m[0][1] * oy + m[0][2] * oz + m[0][3]
            loy = m[1][0] * ox + m[1][1] * oy + m[1][2] * oz + m[1][3]
            loz = m[2][0] * ox + m[2][1] * oy + m[2][2] * oz + m[2][3]
            ldx = m[0][0] * dx + m[0][1] * dy + m[0][2] * dz
            ldy = m[1][0] * dx + m[1][1] * dy + m[1][2] * dz
            ldz = m[2][0] * dx + m[2][1] * dy + m[2][2] * dz
            a = ldx * ldx + ldy * ldy + ldz * ldz
            half_b = lox * ldx + loy * ldy + loz * ldz
            c = lox * lox + loy * loy + loz * loz - 1.0
            disc = half_b * half_b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / jnp.maximum(a, 1e-20)
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            okd = disc >= 0.0
            t = jnp.where(okd & (r0 >= TMIN), r0,
                          jnp.where(okd & (r1 >= TMIN), r1, BIG))
            ok = t < t_best
            t_best = jnp.where(ok, t, t_best)
            radius = _sphere_radius(o2w)
            cxx, cyy, czz = o2w[0][3], o2w[1][3], o2w[2][3]
            d2 = ((cxx - ox) ** 2 + (cyy - oy) ** 2 + (czz - oz) ** 2)
            cos_max = jnp.sqrt(jnp.maximum(
                1.0 - radius * radius / jnp.maximum(d2, 1e-20), 0.0))
            # uniform-sphere pdf when the origin is inside the emitter
            # (cone degenerates; matches sample_emit)
            p = jnp.where(d2 <= radius * radius,
                          1.0 / (2.0 * TWO_PI),
                          1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max),
                                            1e-20))
            pdf = jnp.where(ok, p, pdf)
        return jnp.where(t_best < BIG, pdf, 0.0)

    # ---- homogeneous media (medium.rs; scene-baked records, index 0 =
    # vacuum). Directions are unit vectors throughout the kernel, so the
    # reference's `direction.length()` factor is 1.
    scatter_media = [(mi, m) for mi, m in enumerate(ps.media or [])
                     if not m["vacuum"]]

    def med_consts(med):
        """Per-lane (sigma_t rgb, sigma_s rgb, g, in_medium mask)."""
        zero = med * 0.0
        st = [zero, zero, zero]
        ss = [zero, zero, zero]
        g = zero
        vac = jnp.ones(SHAPE, bool)
        for mi, m in scatter_media:
            sel = med == float(mi)
            for ch in range(3):
                st[ch] = jnp.where(
                    sel, m["sigma_a"][ch] + m["sigma_s"][ch], st[ch])
                ss[ch] = jnp.where(sel, m["sigma_s"][ch], ss[ch])
            g = jnp.where(sel, m["g"], g)
            vac = vac & ~sel
        return st, ss, g, vac

    def med_tr(med, t):
        """Transmittance rgb along unit-direction distance t
        (medium.rs:106-108); vacuum -> 1."""
        st, _, _, vac = med_consts(med)
        return tuple(jnp.where(vac, 1.0, jnp.exp(-st[ch] * t))
                     for ch in range(3))

    def med_sample(med, t_max, st_rng):
        """Per-channel distance sampling (medium.rs:110-133).
        Returns (sampled, t_med, weight rgb, rng)."""
        st, ss, _, vac = med_consts(med)
        u_ch, st_rng = uniform(st_rng)
        u, st_rng = uniform(st_rng)
        ch_f = jnp.floor(u_ch * 3.0)
        sig_ch = jnp.where(ch_f == 0.0, st[0],
                           jnp.where(ch_f == 1.0, st[1], st[2]))
        dist = -jnp.log(jnp.maximum(1.0 - u, 1e-10)) \
            / jnp.maximum(sig_ch, 1e-20)
        sampled = dist < t_max
        t = jnp.minimum(dist, t_max)
        tr = [jnp.exp(-st[ch] * t) for ch in range(3)]
        dens = [jnp.where(sampled, st[ch] * tr[ch], tr[ch])
                for ch in range(3)]
        pdf = (dens[0] + dens[1] + dens[2]) * (1.0 / 3.0)
        pdf = jnp.where(pdf == 0.0, 1.0, pdf)
        w = [jnp.where(sampled, tr[ch] * ss[ch], tr[ch]) / pdf
             for ch in range(3)]
        return (sampled & ~vac, jnp.where(vac, 0.0, t),
                tuple(jnp.where(vac, 1.0, w[ch]) for ch in range(3)),
                st_rng)

    def med_phase(med, cos_theta):
        """Henyey-Greenstein (medium.rs:135-140); vacuum -> 0."""
        _, _, g, vac = med_consts(med)
        denom = 1.0 + g * g + 2.0 * g * cos_theta
        hg = (1.0 / (4.0 * math.pi)) * (1.0 - g * g) / jnp.maximum(
            denom * jnp.sqrt(jnp.maximum(denom, 1e-20)), 1e-20)
        return jnp.where(vac, 0.0, hg)

    def med_sample_p(med, wox, woy, woz, st_rng):
        """HG-sampled scatter direction about wo (medium.rs:142-157)."""
        _, _, g, _ = med_consts(med)
        u0, st_rng = uniform(st_rng)
        u1, st_rng = uniform(st_rng)
        iso = 1.0 - 2.0 * u0
        sqr = (1.0 - g * g) / jnp.maximum(1.0 + g - 2.0 * g * u0, 1e-9)
        aniso = -(1.0 + g * g - sqr * sqr) / jnp.where(
            jnp.abs(g) < 1e-9, 1e-9, 2.0 * g)
        cos_t = jnp.where(jnp.abs(g) < 1e-3, iso, aniso)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = TWO_PI * u1
        # basis about wo (math.rs coordinate_system == onb_from_w)
        ux, uy, uz, vx, vy, vz = onb_from_w(wox, woy, woz)
        cp = jnp.cos(phi) * sin_t
        sp = jnp.sin(phi) * sin_t
        return (ux * cp + vx * sp + wox * cos_t,
                uy * cp + vy * sp + woy * cos_t,
                uz * cp + vz * sp + woz * cos_t, st_rng)

    MAX_TR_MARCH = 32

    def tr_march(ox, oy, oz, dx, dy, dz, med0, want_emit, mref=None):
        """tr / tr_emit (lib.rs:359-468): march transmittance through
        None-material boundaries, switching interior/exterior media.
        Returns rgb transmittance (or emitter radiance for tr_emit).
        Carries use 0/1 float masks (Mosaic can't carry i1 vectors)."""
        zero = ox * 0.0
        one = zero + 1.0

        def cond(c):
            return jnp.any(c["live"] > 0.5) & (c["k"] < MAX_TR_MARCH)

        def body(c):
            live = c["live"] > 0.5
            t, a = trace_closest(c["ox"], c["oy"], c["oz"],
                                 dx, dy, dz, TMIN, mref)
            hit = t < BIG
            mat_none = a["mat"] == float(T.MAT_NONE)
            out_r, out_g, out_b = c["outr"], c["outg"], c["outb"]
            if want_emit:
                emissive = ((a["alr"] != 0.0) | (a["alg"] != 0.0)
                            | (a["alb"] != 0.0))
                nx, ny, nz = normalize3(a["nx"], a["ny"], a["nz"])
                front = (-(dx * nx + dy * ny + dz * nz)) > 0.0
                take = live & hit & emissive
                out_r = out_r + jnp.where(take & front,
                                          c["trr"] * a["alr"], 0.0)
                out_g = out_g + jnp.where(take & front,
                                          c["trg"] * a["alg"], 0.0)
                out_b = out_b + jnp.where(take & front,
                                          c["trb"] * a["alb"], 0.0)
                stop = ~hit | emissive | ~mat_none
            else:
                take = live & ~hit
                out_r = out_r + jnp.where(take, c["trr"], 0.0)
                out_g = out_g + jnp.where(take, c["trg"], 0.0)
                out_b = out_b + jnp.where(take, c["trb"], 0.0)
                stop = ~hit | ~mat_none
            seg = med_tr(c["med"], jnp.minimum(t, 1e20))
            cont = live & ~stop
            trr = jnp.where(cont, c["trr"] * seg[0], c["trr"])
            trg = jnp.where(cont, c["trg"] * seg[1], c["trg"])
            trb = jnp.where(cont, c["trb"] * seg[2], c["trb"])
            crossing_out = (dx * a["nx"] + dy * a["ny"]
                            + dz * a["nz"]) > 0.0
            med = jnp.where(cont,
                            jnp.where(crossing_out, a["emed"], a["imed"]),
                            c["med"])
            return {
                "ox": jnp.where(cont, c["ox"] + t * dx, c["ox"]),
                "oy": jnp.where(cont, c["oy"] + t * dy, c["oy"]),
                "oz": jnp.where(cont, c["oz"] + t * dz, c["oz"]),
                "med": med,
                "trr": trr, "trg": trg, "trb": trb,
                "outr": out_r, "outg": out_g, "outb": out_b,
                "live": jnp.where(cont, one, zero),
                "k": c["k"] + 1,
            }

        out = jax.lax.while_loop(cond, body, {
            "ox": ox + zero, "oy": oy + zero, "oz": oz + zero,
            "med": med0 + zero,
            "trr": one, "trg": one, "trb": one,
            "outr": zero, "outg": zero, "outb": zero,
            "live": one, "k": jnp.int32(0),
        })
        return out["outr"], out["outg"], out["outb"]

    # ---- emitter surface sampling. Triangles: uniform barycentric point
    # (surface_sample.rs:74-105). Spheres: uniform direction in the
    # visible cone (pbrt-style), consistent with the cone pdf
    # trace_emit_pdf reports — the reference samples a uniform point on
    # the whole sphere (surface_sample.rs:107-117), an inconsistent
    # density that brightens glossy surfaces under large close sphere
    # lights (~40% on the veach-mis plates vs the Tungsten golden).
    def sample_emit(px_, py_, pz_, u_obj, u_prim, r, s):
        tx = jnp.zeros(SHAPE)
        ty = jnp.zeros(SHAPE)
        tz = jnp.zeros(SHAPE)
        dirx = jnp.zeros(SHAPE)
        diry = jnp.zeros(SHAPE)
        dirz = jnp.zeros(SHAPE)
        any_tri = False
        flip = (r + s) > 1.0
        rr_ = jnp.where(flip, 1.0 - r, r)
        ss_ = jnp.where(flip, 1.0 - s, s)
        w0 = 1.0 - rr_ - ss_
        eidx = jnp.floor(u_obj * float(max(E, 1)))
        for ei, eo in enumerate(ps.emit_objects):
            sel = eidx == float(ei)
            if eo["kind"] == "tri":
                any_tri = True
                cnt = len(eo["prims"])
                pidx = jnp.floor(u_prim * float(cnt))
                for k, (v0, v1, v2) in enumerate(eo["prims"]):
                    sk = sel & (pidx == float(k))
                    qx = w0 * v0[0] + rr_ * v1[0] + ss_ * v2[0]
                    qy = w0 * v0[1] + rr_ * v1[1] + ss_ * v2[1]
                    qz = w0 * v0[2] + rr_ * v1[2] + ss_ * v2[2]
                    tx = jnp.where(sk, qx, tx)
                    ty = jnp.where(sk, qy, ty)
                    tz = jnp.where(sk, qz, tz)
            else:
                m = eo["o2w"]
                cx, cy, cz = m[0][3], m[1][3], m[2][3]
                radius = _sphere_radius(m)
                wx_, wy_, wz_ = cx - px_, cy - py_, cz - pz_
                d2 = jnp.maximum(wx_ * wx_ + wy_ * wy_ + wz_ * wz_, 1e-12)
                cos_max = jnp.sqrt(jnp.maximum(
                    1.0 - radius * radius / d2, 0.0))
                # inside the emitter: uniform sphere (matches the pdf)
                cos_t = jnp.where(d2 <= radius * radius,
                                  1.0 - 2.0 * r,
                                  1.0 - r * (1.0 - cos_max))
                sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                phi = TWO_PI * s
                wx_, wy_, wz_ = normalize3(wx_, wy_, wz_)
                ux, uy, uz, vx, vy, vz = onb_from_w(wx_, wy_, wz_)
                cp = jnp.cos(phi) * sin_t
                sp = jnp.sin(phi) * sin_t
                dirx = jnp.where(sel, ux * cp + vx * sp + wx_ * cos_t, dirx)
                diry = jnp.where(sel, uy * cp + vy * sp + wy_ * cos_t, diry)
                dirz = jnp.where(sel, uz * cp + vz * sp + wz_ * cos_t, dirz)
        if not any_tri:
            return dirx, diry, dirz
        tdx, tdy, tdz = normalize3(tx - px_, ty - py_, tz - pz_)
        is_dir = (dirx != 0.0) | (diry != 0.0) | (dirz != 0.0)
        return (jnp.where(is_dir, dirx, tdx),
                jnp.where(is_dir, diry, tdy),
                jnp.where(is_dir, dirz, tdz))

    # ---- BSDF (local frame; scene-specialized material set)
    mats_present = sorted(MATSET)
    has_matte = T.MAT_MATTE in mats_present
    has_metal = T.MAT_METAL in mats_present
    has_mirror = T.MAT_MIRROR in mats_present
    has_glass = T.MAT_GLASS in mats_present
    has_substrate = T.MAT_SUBSTRATE in mats_present
    has_plastic = T.MAT_PLASTIC in mats_present
    has_uber = T.MAT_UBER in mats_present

    def onb_from_w(nx, ny, nz):
        x_major = jnp.abs(nx) > jnp.abs(ny)
        inv = jax.lax.rsqrt(jnp.maximum(
            jnp.where(x_major, nx * nx + nz * nz, ny * ny + nz * nz), 1e-20))
        zero = jnp.zeros(SHAPE)
        ux = jnp.where(x_major, -nz, zero) * inv
        uy = jnp.where(x_major, zero, nz) * inv
        uz = jnp.where(x_major, nx, -ny) * inv
        vx = ny * uz - nz * uy
        vy = nz * ux - nx * uz
        vz = nx * uy - ny * ux
        return ux, uy, uz, vx, vy, vz

    def to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz, ax, ay, az):
        return (ax * ux + ay * uy + az * uz,
                ax * vx + ay * vy + az * vz,
                ax * nx + ay * ny + az * nz)

    def to_world(ux, uy, uz, vx, vy, vz, nx, ny, nz, ax, ay, az):
        return (ax * ux + ay * vx + az * nx,
                ax * uy + ay * vy + az * ny,
                ax * uz + ay * vz + az * nz)

    def fr_dielectric(cos_i, eta_i, eta_t):
        c = jnp.clip(cos_i, -1.0, 1.0)
        entering = c > 0.0
        ei = jnp.where(entering, eta_i, eta_t)
        et = jnp.where(entering, eta_t, eta_i)
        c = jnp.abs(c)
        sin_i = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        sin_t = ei / et * sin_i
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
        rp = ((et * c) - (ei * cos_t)) / jnp.maximum(
            (et * c) + (ei * cos_t), 1e-20)
        rs = ((ei * c) - (et * cos_t)) / jnp.maximum(
            (ei * c) + (et * cos_t), 1e-20)
        return jnp.where(sin_t >= 1.0, 1.0, 0.5 * (rp * rp + rs * rs))

    def fr_conductor_ch(c2, s2, eta, etk, c):
        eta2 = eta * eta
        etk2 = etk * etk
        t0 = eta2 - etk2 - s2
        a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etk2, 0.0))
        t1 = a2b2 + c2
        a_ = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
        t2 = 2.0 * c * a_
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
        t3 = c2 * a2b2 + s2 * s2
        t4 = t2 * s2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
        return 0.5 * (rp + rs)

    # RENE_MF_DIST=beckmann swaps every microfacet lobe's distribution to
    # Beckmann (D + Smith-lambda fit + full-normal sampling with its own
    # matching pdf) — a diagnostic for the veach lobe-shape residual
    # (VALIDATION.md: the golden's highlights are crisper than GGX at the
    # energy-matching alpha; Beckmann has narrower tails). Process-level:
    # read at kernel-build time, so set it before the first render.
    mf_beckmann = os.environ.get("RENE_MF_DIST", "") == "beckmann"

    def ggx_d(ax_, ay_, hx, hy, hz):
        c2 = hz * hz
        s2 = jnp.maximum(1.0 - c2, 0.0)
        tan2 = s2 / jnp.maximum(c2, 1e-20)
        # cos2_phi/sin2_phi via x/y of wh
        sin_t = jnp.sqrt(s2)
        cphi = jnp.where(sin_t == 0.0, 1.0,
                         jnp.clip(hx / jnp.maximum(sin_t, 1e-20), -1., 1.))
        sphi = jnp.where(sin_t == 0.0, 0.0,
                         jnp.clip(hy / jnp.maximum(sin_t, 1e-20), -1., 1.))
        e = (cphi * cphi / jnp.maximum(ax_ * ax_, 1e-20)
             + sphi * sphi / jnp.maximum(ay_ * ay_, 1e-20)) * tan2
        if mf_beckmann:
            d = jnp.exp(-jnp.minimum(e, 80.0)) / jnp.maximum(
                math.pi * ax_ * ay_ * c2 * c2, 1e-30)
        else:
            d = 1.0 / jnp.maximum(
                math.pi * ax_ * ay_ * c2 * c2 * (1.0 + e) ** 2, 1e-30)
        return jnp.where(tan2 < 3e38, d, 0.0)

    def ggx_lambda(ax_, ay_, x, y, z):
        # exact GGX Smith lambda (ops/microfacet.tr_lambda rationale: the
        # reference's rational fit is Beckmann's, the goldens are exact)
        c2 = z * z
        s2 = jnp.maximum(1.0 - c2, 0.0)
        abs_tan = jnp.sqrt(s2) / jnp.maximum(jnp.abs(z), 1e-20)
        sin_t = jnp.sqrt(s2)
        cphi = jnp.where(sin_t == 0.0, 1.0,
                         jnp.clip(x / jnp.maximum(sin_t, 1e-20), -1., 1.))
        sphi = jnp.where(sin_t == 0.0, 0.0,
                         jnp.clip(y / jnp.maximum(sin_t, 1e-20), -1., 1.))
        alpha = jnp.sqrt(cphi * cphi * ax_ * ax_ + sphi * sphi * ay_ * ay_)
        if mf_beckmann:
            # pbrt's Beckmann rational fit (a >= 1.6 -> 0)
            a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-9)
            lam = jnp.where(
                a >= 1.6, 0.0,
                (1.0 - 1.259 * a + 0.396 * a * a)
                / jnp.maximum(3.535 * a + 2.181 * a * a, 1e-9))
            return jnp.where(abs_tan < 3e38, lam, 0.0)
        at2 = jnp.minimum((alpha * abs_tan) ** 2, 1e30)
        return 0.5 * (-1.0 + jnp.sqrt(1.0 + at2))

    def wh_pdf(ax_, ay_, wox, woy, woz, hx, hy, hz, d):
        """pdf of the sampled half-vector wh under the active sampler:
        GGX visible-normal (D G1(wo) |wo.wh| / |cos wo|) or Beckmann
        full-normal (D |cos wh|)."""
        if mf_beckmann:
            return d * jnp.abs(hz)
        g1o = 1.0 / (1.0 + ggx_lambda(ax_, ay_, wox, woy, woz))
        return d * g1o * jnp.abs(dot3(wox, woy, woz, hx, hy, hz)) \
            / jnp.maximum(jnp.abs(woz), 1e-9)

    def beckmann_sample_wh(ax_, ay_, wx_, wy_, wz_, u1, u2):
        # full-normal Beckmann sampling (pbrt Sample_wh, non-visible):
        # elliptical phi without atan via (cos,sin) ∝ (ax cos t, ay sin t)
        t = TWO_PI * u2
        rx = ax_ * jnp.cos(t)
        ry = ay_ * jnp.sin(t)
        rn = jnp.sqrt(jnp.maximum(rx * rx + ry * ry, 1e-30))
        cphi = rx / rn
        sphi = ry / rn
        logs = jnp.log(jnp.maximum(1.0 - u1, 1e-9))
        tan2 = -logs / jnp.maximum(
            cphi * cphi / jnp.maximum(ax_ * ax_, 1e-20)
            + sphi * sphi / jnp.maximum(ay_ * ay_, 1e-20), 1e-20)
        cz = 1.0 / jnp.sqrt(1.0 + tan2)
        sz = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 0.0))
        hx, hy, hz = sz * cphi, sz * sphi, cz
        flip = wz_ < 0.0
        return (jnp.where(flip, -hx, hx), jnp.where(flip, -hy, hy),
                jnp.where(flip, -hz, hz))

    def ggx_sample_wh(ax_, ay_, wx_, wy_, wz_, u1, u2):
        flip = wz_ < 0.0
        sx = jnp.where(flip, -wx_, wx_)
        sy = jnp.where(flip, -wy_, wy_)
        sz = jnp.where(flip, -wz_, wz_)
        stx, sty, stz = normalize3(ax_ * sx, ay_ * sy, sz)
        cos_t = stz
        # sample11
        r_s = jnp.sqrt(u1 / jnp.maximum(1.0 - u1, 1e-9))
        phi_s = TWO_PI * u2
        spec_x = r_s * jnp.cos(phi_s)
        spec_y = r_s * jnp.sin(phi_s)
        cc = jnp.clip(cos_t, -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cc * cc, 0.0))
        tan_t = sin_t / jnp.maximum(cc, 1e-9)
        a0 = 1.0 / jnp.maximum(tan_t, 1e-9)
        g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a0 * a0)))
        aa = 2.0 * u1 / jnp.maximum(g1, 1e-9) - 1.0
        tmp = jnp.minimum(1.0 / jnp.where(jnp.abs(aa * aa - 1.0) > 1e-12,
                                          aa * aa - 1.0, 1e-12), 1e10)
        bb = tan_t
        dd = jnp.sqrt(jnp.maximum(bb * bb * tmp * tmp
                                  - (aa * aa - bb * bb) * tmp, 0.0))
        sl1 = bb * tmp - dd
        sl2 = bb * tmp + dd
        slope_x = jnp.where((aa < 0.0) | (sl2 > a0), sl1, sl2)
        sflip = jnp.where(u2 > 0.5, 1.0, -1.0)
        u2f = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
        zz = ((u2f * (u2f * (u2f * 0.27385 - 0.73369) + 0.46341))
              / (u2f * (u2f * (u2f * 0.093073 + 0.309420) - 1.0) + 0.597999))
        slope_y = sflip * zz * jnp.sqrt(1.0 + slope_x * slope_x)
        sin_p = jnp.where(sin_t == 0.0, 0.0,
                          jnp.clip(sty / jnp.maximum(sin_t, 1e-20), -1., 1.))
        cos_p = jnp.where(sin_t == 0.0, 1.0,
                          jnp.clip(stx / jnp.maximum(sin_t, 1e-20), -1., 1.))
        slope_x2 = jnp.where(cos_t > 0.9999, spec_x,
                             cos_p * slope_x - sin_p * slope_y)
        slope_y2 = jnp.where(cos_t > 0.9999, spec_y,
                             sin_p * slope_x + cos_p * slope_y)
        hx, hy, hz = normalize3(-ax_ * slope_x2, -ay_ * slope_y2,
                                jnp.ones(SHAPE))
        return (jnp.where(flip, -hx, hx), jnp.where(flip, -hy, hy),
                jnp.where(flip, -hz, hz))

    if mf_beckmann:
        ggx_sample_wh = beckmann_sample_wh  # noqa: F811

    def bsdf_eval(attr, wox, woy, woz, wix, wiy, wiz):
        """f and pdf in the local frame (diffuse-capable lobes only —
        specular lobes return 0 from f/pdf, reflection.rs)."""
        mat = attr["mat"]
        same = woz * wiz > 0.0
        f_r = jnp.zeros(SHAPE)
        f_g = jnp.zeros(SHAPE)
        f_b = jnp.zeros(SHAPE)
        pdf = jnp.zeros(SHAPE)
        if has_matte:
            sel = (mat == float(T.MAT_MATTE)) & same
            f_r = jnp.where(sel, attr["abr"] * INV_PI, f_r)
            f_g = jnp.where(sel, attr["abg"] * INV_PI, f_g)
            f_b = jnp.where(sel, attr["abb"] * INV_PI, f_b)
            pdf = jnp.where(sel, jnp.abs(wiz) * INV_PI, pdf)
        if has_metal:
            sel = (mat == float(T.MAT_METAL)) & same
            hx, hy, hz = normalize3(wox + wix, woy + wiy, woz + wiz)
            hx = jnp.where(hz < 0, -hx, hx)
            hy = jnp.where(hz < 0, -hy, hy)
            hz = jnp.where(hz < 0, -hz, hz)
            ax_ = attr["ax"]
            ay_ = attr["ay"]
            d = ggx_d(ax_, ay_, hx, hy, hz)
            g = 1.0 / (1.0 + ggx_lambda(ax_, ay_, wox, woy, woz)
                       + ggx_lambda(ax_, ay_, wix, wiy, wiz))
            ci = jnp.abs(wiz)
            co = jnp.abs(woz)
            cos_ih = dot3(wix, wiy, wiz, hx, hy, hz)
            c2 = jnp.clip(cos_ih, -1, 1) ** 2
            s2 = 1.0 - c2
            cabs = jnp.abs(cos_ih)
            fr_r = fr_conductor_ch(c2, s2, attr["etar"], attr["kr"], cabs)
            fr_g = fr_conductor_ch(c2, s2, attr["etag"], attr["kg"], cabs)
            fr_b = fr_conductor_ch(c2, s2, attr["etab"], attr["kb"], cabs)
            if HAS_MSCALE:
                fr_r = fr_r * attr["msr"]
                fr_g = fr_g * attr["msg"]
                fr_b = fr_b * attr["msb"]
            base = d * g / jnp.maximum(4.0 * ci * co, 1e-20)
            bad = (ci == 0.0) | (co == 0.0)
            f_r = jnp.where(sel & ~bad, base * fr_r, f_r)
            f_g = jnp.where(sel & ~bad, base * fr_g, f_g)
            f_b = jnp.where(sel & ~bad, base * fr_b, f_b)
            pdf_wh = wh_pdf(ax_, ay_, wox, woy, woz, hx, hy, hz, d)
            pdf = jnp.where(sel, pdf_wh / jnp.maximum(
                4.0 * dot3(wox, woy, woz, hx, hy, hz), 1e-20), pdf)
        if has_substrate:
            # FresnelBlend::f / pdf (bxdf.rs:266-317): Kd in ab*, Ks in k*
            sel = (mat == float(T.MAT_SUBSTRATE)) & same
            awi = jnp.abs(wiz)
            awo = jnp.abs(woz)

            def pw5(x):
                return (x * x) * (x * x) * x

            dterm = ((28.0 / (23.0 * math.pi))
                     * (1.0 - pw5(1.0 - 0.5 * awi))
                     * (1.0 - pw5(1.0 - 0.5 * awo)))
            hx0 = wox + wix
            hy0 = woy + wiy
            hz0 = woz + wiz
            degen = (hx0 * hx0 + hy0 * hy0 + hz0 * hz0) < 1e-18
            hx, hy, hz = normalize3(hx0, hy0, hz0)
            cos_ih = dot3(wix, wiy, wiz, hx, hy, hz)
            sch = pw5(jnp.clip(1.0 - cos_ih, 0.0, 1.0))
            ax_ = attr["ax"]
            ay_ = attr["ay"]
            d = ggx_d(ax_, ay_, hx, hy, hz)
            sden = jnp.maximum(4.0 * jnp.abs(cos_ih)
                               * jnp.maximum(awi, awo), 1e-20)
            sub_r = (attr["abr"] * (1.0 - attr["kr"]) * dterm
                     + (attr["kr"] + (1.0 - attr["kr"]) * sch) * d / sden)
            sub_g = (attr["abg"] * (1.0 - attr["kg"]) * dterm
                     + (attr["kg"] + (1.0 - attr["kg"]) * sch) * d / sden)
            sub_b = (attr["abb"] * (1.0 - attr["kb"]) * dterm
                     + (attr["kb"] + (1.0 - attr["kb"]) * sch) * d / sden)
            ok = sel & ~degen
            f_r = jnp.where(ok, sub_r, f_r)
            f_g = jnp.where(ok, sub_g, f_g)
            f_b = jnp.where(ok, sub_b, f_b)
            doh = dot3(wox, woy, woz, hx, hy, hz)
            pdf_wh = wh_pdf(ax_, ay_, wox, woy, woz, hx, hy, hz, d)
            p_sub = 0.5 * (awi * INV_PI
                           + pdf_wh / jnp.maximum(4.0 * doh, 1e-20))
            pdf = jnp.where(ok, p_sub, pdf)
        if has_plastic or has_uber:
            # lambert(Kd) + microfacet(Ks, dielectric fresnel) stack
            # (reflection.rs Bsdf::f sums side-matching lobes; Bsdf::pdf
            # averages over ALL active lobes, incl. f=0 specular ones)
            hx0 = wox + wix
            hy0 = woy + wiy
            hz0 = woz + wiz
            degen = (hx0 * hx0 + hy0 * hy0 + hz0 * hz0) < 1e-18
            hx, hy, hz = normalize3(hx0, hy0, hz0)
            hx = jnp.where(hz < 0, -hx, hx)
            hy = jnp.where(hz < 0, -hy, hy)
            hz = jnp.where(hz < 0, -hz, hz)
            ax_ = attr["ax"]
            ay_ = attr["ay"]
            d = ggx_d(ax_, ay_, hx, hy, hz)
            g = 1.0 / (1.0 + ggx_lambda(ax_, ay_, wox, woy, woz)
                       + ggx_lambda(ax_, ay_, wix, wiy, wiz))
            ci = jnp.abs(wiz)
            co = jnp.abs(woz)
            cos_ih = dot3(wix, wiy, wiz, hx, hy, hz)
            base = d * g / jnp.maximum(4.0 * ci * co, 1e-20)
            mic_bad = (ci == 0.0) | (co == 0.0) | degen
            doh = dot3(wox, woy, woz, hx, hy, hz)
            pdf_wh = wh_pdf(ax_, ay_, wox, woy, woz, hx, hy, hz, d)
            pdf_mic = pdf_wh / jnp.maximum(4.0 * doh, 1e-20)
            kd_on = ((attr["abr"] != 0.0) | (attr["abg"] != 0.0)
                     | (attr["abb"] != 0.0))
            ks_on = ((attr["kr"] != 0.0) | (attr["kg"] != 0.0)
                     | (attr["kb"] != 0.0))
            stacks = []
            if has_plastic:
                stacks.append((T.MAT_PLASTIC, 1.5, 1.0, None))
            if has_uber:
                stacks.append((T.MAT_UBER, 1.0, attr["ir"], "uber"))
            for mt_tag, ei, et, kind in stacks:
                sel = (mat == float(mt_tag)) & same
                fr = fr_dielectric(cos_ih, ei * jnp.ones(SHAPE),
                                   et * jnp.ones(SHAPE))
                nact = kd_on.astype(jnp.float32) \
                    + ks_on.astype(jnp.float32)
                if kind == "uber":
                    for a, b, cc in (("opr", "opg", "opb"),
                                     ("krr", "krg", "krb"),
                                     ("ktr", "ktg", "ktb")):
                        nact = nact + ((attr[a] != 0.0) | (attr[b] != 0.0)
                                       | (attr[cc] != 0.0)
                                       ).astype(jnp.float32)
                mic_ok = ks_on & ~mic_bad
                fv_r = (jnp.where(kd_on, attr["abr"] * INV_PI, 0.0)
                        + jnp.where(mic_ok, attr["kr"] * fr * base, 0.0))
                fv_g = (jnp.where(kd_on, attr["abg"] * INV_PI, 0.0)
                        + jnp.where(mic_ok, attr["kg"] * fr * base, 0.0))
                fv_b = (jnp.where(kd_on, attr["abb"] * INV_PI, 0.0)
                        + jnp.where(mic_ok, attr["kb"] * fr * base, 0.0))
                p = (jnp.where(kd_on, jnp.abs(wiz) * INV_PI, 0.0)
                     + jnp.where(ks_on, pdf_mic, 0.0)) \
                    / jnp.maximum(nact, 1.0)
                f_r = jnp.where(sel, fv_r, f_r)
                f_g = jnp.where(sel, fv_g, f_g)
                f_b = jnp.where(sel, fv_b, f_b)
                pdf = jnp.where(sel, p, pdf)
        return f_r, f_g, f_b, pdf

    def bsdf_sample(attr, wox, woy, woz, u_coin, u1, u2, ul=None):
        """(wi, f, pdf) in local frame; mirrors bsdf.sample_chosen. `ul`
        picks the lobe for multi-lobe materials (uber/plastic); the
        sampled pdf is divided by the active-lobe count
        (reflection.rs:313-326)."""
        mat = attr["mat"]
        wix = jnp.zeros(SHAPE)
        wiy = jnp.zeros(SHAPE)
        wiz = jnp.zeros(SHAPE)
        f_r = jnp.zeros(SHAPE)
        f_g = jnp.zeros(SHAPE)
        f_b = jnp.zeros(SHAPE)
        pdf = jnp.zeros(SHAPE)
        if has_matte:
            sel = mat == float(T.MAT_MATTE)
            zc = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
            phi = TWO_PI * u1
            r2s = jnp.sqrt(u2)
            cx = jnp.cos(phi) * r2s
            cy = jnp.sin(phi) * r2s
            cz = jnp.where(woz < 0.0, -zc, zc)
            wix = jnp.where(sel, cx, wix)
            wiy = jnp.where(sel, cy, wiy)
            wiz = jnp.where(sel, cz, wiz)
            f_r = jnp.where(sel, attr["abr"] * INV_PI, f_r)
            f_g = jnp.where(sel, attr["abg"] * INV_PI, f_g)
            f_b = jnp.where(sel, attr["abb"] * INV_PI, f_b)
            pdf = jnp.where(sel, jnp.abs(cz) * INV_PI, pdf)
        if has_metal:
            sel = mat == float(T.MAT_METAL)
            ax_ = attr["ax"]
            ay_ = attr["ay"]
            hx, hy, hz = ggx_sample_wh(ax_, ay_, wox, woy, woz, u1, u2)
            doh = dot3(wox, woy, woz, hx, hy, hz)
            mx = -wox + 2.0 * doh * hx
            my = -woy + 2.0 * doh * hy
            mz = -woz + 2.0 * doh * hz
            bad = (woz == 0.0) | (doh < 0.0) | (woz * mz <= 0.0)
            fe_r, fe_g, fe_b, _ = bsdf_eval(
                {**attr, "mat": jnp.full(SHAPE, float(T.MAT_METAL))},
                wox, woy, woz, mx, my, mz)
            d = ggx_d(ax_, ay_, hx, hy, hz)
            p = wh_pdf(ax_, ay_, wox, woy, woz, hx, hy, hz, d) \
                / jnp.maximum(4.0 * doh, 1e-20)
            wix = jnp.where(sel, mx, wix)
            wiy = jnp.where(sel, my, wiy)
            wiz = jnp.where(sel, mz, wiz)
            f_r = jnp.where(sel & ~bad, fe_r, jnp.where(sel, 0.0, f_r))
            f_g = jnp.where(sel & ~bad, fe_g, jnp.where(sel, 0.0, f_g))
            f_b = jnp.where(sel & ~bad, fe_b, jnp.where(sel, 0.0, f_b))
            pdf = jnp.where(sel & ~bad, p, jnp.where(sel, 0.0, pdf))
        if has_substrate:
            # FresnelBlend::sample_f (bxdf.rs:292-317): coin-flip between
            # the cosine lobe and the GGX half-vector reflection, then
            # evaluate the shared f/pdf mixture
            sel = mat == float(T.MAT_SUBSTRATE)
            zc = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
            phi = TWO_PI * u1
            r2s = jnp.sqrt(u2)
            cx = jnp.cos(phi) * r2s
            cy = jnp.sin(phi) * r2s
            cz = jnp.where(woz < 0.0, -zc, zc)
            hx, hy, hz = ggx_sample_wh(attr["ax"], attr["ay"],
                                       wox, woy, woz, u1, u2)
            doh = dot3(wox, woy, woz, hx, hy, hz)
            spx = -wox + 2.0 * doh * hx
            spy = -woy + 2.0 * doh * hy
            spz = -woz + 2.0 * doh * hz
            take_cos = u_coin < 0.5
            bwx = jnp.where(take_cos, cx, spx)
            bwy = jnp.where(take_cos, cy, spy)
            bwz = jnp.where(take_cos, cz, spz)
            fe_r, fe_g, fe_b, fe_pdf = bsdf_eval(
                {**attr, "mat": jnp.full(SHAPE, float(T.MAT_SUBSTRATE))},
                wox, woy, woz, bwx, bwy, bwz)
            wix = jnp.where(sel, bwx, wix)
            wiy = jnp.where(sel, bwy, wiy)
            wiz = jnp.where(sel, bwz, wiz)
            f_r = jnp.where(sel, fe_r, f_r)
            f_g = jnp.where(sel, fe_g, f_g)
            f_b = jnp.where(sel, fe_b, f_b)
            pdf = jnp.where(sel, fe_pdf, pdf)
        if has_mirror:
            sel = mat == float(T.MAT_MIRROR)
            inv_c = 1.0 / jnp.maximum(jnp.abs(woz), 1e-9)
            wix = jnp.where(sel, -wox, wix)
            wiy = jnp.where(sel, -woy, wiy)
            wiz = jnp.where(sel, woz, wiz)
            f_r = jnp.where(sel, attr["abr"] * inv_c, f_r)
            f_g = jnp.where(sel, attr["abg"] * inv_c, f_g)
            f_b = jnp.where(sel, attr["abb"] * inv_c, f_b)
            pdf = jnp.where(sel, 1.0, pdf)
        if has_glass:
            sel = mat == float(T.MAT_GLASS)
            ir = attr["ir"]
            fd = fr_dielectric(woz, jnp.ones(SHAPE), ir)
            take_refl = u_coin < fd
            # refract about +-z
            nz_ = jnp.where(woz > 0.0, 1.0, -1.0)
            eta_ratio = jnp.where(woz > 0.0, 1.0 / jnp.maximum(ir, 1e-9), ir)
            cos_i = nz_ * woz
            sin2_t = eta_ratio * eta_ratio * jnp.maximum(
                1.0 - cos_i * cos_i, 0.0)
            ok_t = sin2_t < 1.0
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
            tx = -wox * eta_ratio
            ty = -woy * eta_ratio
            tz = -woz * eta_ratio + (eta_ratio * cos_i - cos_t) * nz_
            gx = jnp.where(take_refl, -wox, tx)
            gy = jnp.where(take_refl, -woy, ty)
            gz = jnp.where(take_refl, woz, tz)
            val = jnp.where(take_refl,
                            fd / jnp.maximum(jnp.abs(woz), 1e-9),
                            (1.0 - fd) / jnp.maximum(jnp.abs(gz), 1e-9))
            gp = jnp.where(take_refl, fd, jnp.where(ok_t, 1.0 - fd, 0.0))
            wix = jnp.where(sel, gx, wix)
            wiy = jnp.where(sel, gy, wiy)
            wiz = jnp.where(sel, gz, wiz)
            f_r = jnp.where(sel, val, f_r)
            f_g = jnp.where(sel, val, f_g)
            f_b = jnp.where(sel, val, f_b)
            pdf = jnp.where(sel, gp, pdf)
        if has_plastic or has_uber:
            # multi-lobe stack sampling: uniform pick among active lobes,
            # single-lobe f/pdf, pdf /= count (reflection.rs:313-326)
            zc = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
            phi = TWO_PI * u1
            r2s = jnp.sqrt(u2)
            cx = jnp.cos(phi) * r2s
            cy = jnp.sin(phi) * r2s
            cz = jnp.where(woz < 0.0, -zc, zc)
            ax_ = attr["ax"]
            ay_ = attr["ay"]
            hx, hy, hz = ggx_sample_wh(ax_, ay_, wox, woy, woz, u1, u2)
            doh = dot3(wox, woy, woz, hx, hy, hz)
            mx = -wox + 2.0 * doh * hx
            my = -woy + 2.0 * doh * hy
            mz = -woz + 2.0 * doh * hz
            mic_bad = (woz == 0.0) | (doh < 0.0) | (woz * mz <= 0.0)
            d = ggx_d(ax_, ay_, hx, hy, hz)
            g = 1.0 / (1.0 + ggx_lambda(ax_, ay_, wox, woy, woz)
                       + ggx_lambda(ax_, ay_, mx, my, mz))
            ci = jnp.abs(mz)
            co = jnp.abs(woz)
            mic_base = d * g / jnp.maximum(4.0 * ci * co, 1e-20)
            cos_ih = dot3(mx, my, mz, hx, hy, hz)
            pdf_mic = (wh_pdf(ax_, ay_, wox, woy, woz, hx, hy, hz, d)
                       / jnp.maximum(4.0 * doh, 1e-20))
            kd_on = ((attr["abr"] != 0.0) | (attr["abg"] != 0.0)
                     | (attr["abb"] != 0.0))
            ks_on = ((attr["kr"] != 0.0) | (attr["kg"] != 0.0)
                     | (attr["kb"] != 0.0))
            pdf_lam = jnp.abs(cz) * INV_PI

            if has_plastic:
                sel = mat == float(T.MAT_PLASTIC)
                fr = fr_dielectric(cos_ih, 1.5 * jnp.ones(SHAPE),
                                   jnp.ones(SHAPE))
                nact = kd_on.astype(jnp.float32) \
                    + ks_on.astype(jnp.float32)
                j = jnp.floor(ul * nact)
                pick_lam = kd_on & (j == 0.0)
                pick_mic = ks_on & (j == kd_on.astype(jnp.float32))
                p_wix = jnp.where(pick_lam, cx, mx)
                p_wiy = jnp.where(pick_lam, cy, my)
                p_wiz = jnp.where(pick_lam, cz, mz)
                ok_mic = pick_mic & ~mic_bad
                pf_r = (jnp.where(pick_lam, attr["abr"] * INV_PI, 0.0)
                        + jnp.where(ok_mic, attr["kr"] * fr * mic_base,
                                    0.0))
                pf_g = (jnp.where(pick_lam, attr["abg"] * INV_PI, 0.0)
                        + jnp.where(ok_mic, attr["kg"] * fr * mic_base,
                                    0.0))
                pf_b = (jnp.where(pick_lam, attr["abb"] * INV_PI, 0.0)
                        + jnp.where(ok_mic, attr["kb"] * fr * mic_base,
                                    0.0))
                pp = (jnp.where(pick_lam, pdf_lam, 0.0)
                      + jnp.where(ok_mic, pdf_mic, 0.0)) \
                    / jnp.maximum(nact, 1.0)
                wix = jnp.where(sel, p_wix, wix)
                wiy = jnp.where(sel, p_wiy, wiy)
                wiz = jnp.where(sel, p_wiz, wiz)
                f_r = jnp.where(sel, pf_r, f_r)
                f_g = jnp.where(sel, pf_g, f_g)
                f_b = jnp.where(sel, pf_b, f_b)
                pdf = jnp.where(sel, pp, pdf)

            if has_uber:
                sel = mat == float(T.MAT_UBER)
                eta = attr["ir"]
                fr = fr_dielectric(cos_ih, jnp.ones(SHAPE), eta)
                op_on = ((attr["opr"] != 0.0) | (attr["opg"] != 0.0)
                         | (attr["opb"] != 0.0))
                kr_on = ((attr["krr"] != 0.0) | (attr["krg"] != 0.0)
                         | (attr["krb"] != 0.0))
                kt_on = ((attr["ktr"] != 0.0) | (attr["ktg"] != 0.0)
                         | (attr["ktb"] != 0.0))
                ind = [x.astype(jnp.float32)
                       for x in (op_on, kd_on, ks_on, kr_on, kt_on)]
                nact = ind[0] + ind[1] + ind[2] + ind[3] + ind[4]
                j = jnp.floor(ul * nact)
                rank1 = ind[0]
                rank2 = rank1 + ind[1]
                rank3 = rank2 + ind[2]
                rank4 = rank3 + ind[3]
                pick_op = op_on & (j == 0.0)
                pick_lam = kd_on & (j == rank1)
                pick_mic = ks_on & (j == rank2)
                pick_kr = kr_on & (j == rank3)
                pick_kt = kt_on & (j == rank4)
                inv_co = 1.0 / jnp.maximum(jnp.abs(woz), 1e-9)
                # opacity passthrough: spec transmission at eta 1:1
                # (fresnel 0) -> wi = -wo, f = t_op/|cos|
                # Kr: specular reflection with dielectric fresnel at woz
                fr_kr = fr_dielectric(woz, jnp.ones(SHAPE), eta)
                # Kt: specular transmission across (1, eta)
                nz_ = jnp.where(woz > 0.0, 1.0, -1.0)
                eta_ratio = jnp.where(woz > 0.0,
                                      1.0 / jnp.maximum(eta, 1e-9), eta)
                cos_i = nz_ * woz
                sin2_t = eta_ratio * eta_ratio * jnp.maximum(
                    1.0 - cos_i * cos_i, 0.0)
                ok_t = sin2_t < 1.0
                cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
                tx = -wox * eta_ratio
                ty = -woy * eta_ratio
                tz = -woz * eta_ratio + (eta_ratio * cos_i - cos_t) * nz_
                fr_kt = fr_dielectric(tz, jnp.ones(SHAPE), eta)
                inv_ct = 1.0 / jnp.maximum(jnp.abs(tz), 1e-9)
                ok_mic = pick_mic & ~mic_bad
                ok_kt = pick_kt & ok_t
                u_wix = jnp.where(pick_op, -wox,
                                  jnp.where(pick_lam, cx,
                                            jnp.where(pick_mic, mx,
                                                      jnp.where(pick_kr,
                                                                -wox, tx))))
                u_wiy = jnp.where(pick_op, -woy,
                                  jnp.where(pick_lam, cy,
                                            jnp.where(pick_mic, my,
                                                      jnp.where(pick_kr,
                                                                -woy, ty))))
                u_wiz = jnp.where(pick_op, -woz,
                                  jnp.where(pick_lam, cz,
                                            jnp.where(pick_mic, mz,
                                                      jnp.where(pick_kr,
                                                                woz, tz))))

                def lobe_f(ch_op, ch_ab, ch_k, ch_kr, ch_kt):
                    return (jnp.where(pick_op, ch_op * inv_co, 0.0)
                            + jnp.where(pick_lam, ch_ab * INV_PI, 0.0)
                            + jnp.where(ok_mic, ch_k * fr * mic_base, 0.0)
                            + jnp.where(pick_kr, ch_kr * fr_kr * inv_co,
                                        0.0)
                            + jnp.where(ok_kt, ch_kt * (1.0 - fr_kt)
                                        * inv_ct, 0.0))

                uf_r = lobe_f(attr["opr"], attr["abr"], attr["kr"],
                              attr["krr"], attr["ktr"])
                uf_g = lobe_f(attr["opg"], attr["abg"], attr["kg"],
                              attr["krg"], attr["ktg"])
                uf_b = lobe_f(attr["opb"], attr["abb"], attr["kb"],
                              attr["krb"], attr["ktb"])
                up = (jnp.where(pick_op | pick_kr, 1.0, 0.0)
                      + jnp.where(pick_lam, pdf_lam, 0.0)
                      + jnp.where(ok_mic, pdf_mic, 0.0)
                      + jnp.where(ok_kt, 1.0, 0.0)) \
                    / jnp.maximum(nact, 1.0)
                wix = jnp.where(sel, u_wix, wix)
                wiy = jnp.where(sel, u_wiy, wiy)
                wiz = jnp.where(sel, u_wiz, wiz)
                f_r = jnp.where(sel, uf_r, f_r)
                f_g = jnp.where(sel, uf_g, f_g)
                f_b = jnp.where(sel, uf_b, f_b)
                pdf = jnp.where(sel, up, pdf)
        return wix, wiy, wiz, f_r, f_g, f_b, pdf

    diffuse_mats = [m for m in mats_present
                    if m in (T.MAT_MATTE, T.MAT_METAL, T.MAT_SUBSTRATE)]

    def is_diffuse(attr):
        """Per-lane Bsdf::contains(DIFFUSE): static for single-lobe
        materials, payload-dependent for uber/plastic (a lobe exists only
        when its weight is nonzero)."""
        mat = attr["mat"]
        d = jnp.zeros(SHAPE, bool)
        for m in diffuse_mats:
            d = d | (mat == float(m))
        if has_plastic or has_uber:
            kd_on = ((attr["abr"] != 0.0) | (attr["abg"] != 0.0)
                     | (attr["abb"] != 0.0))
            ks_on = ((attr["kr"] != 0.0) | (attr["kg"] != 0.0)
                     | (attr["kb"] != 0.0))
            for m in (T.MAT_PLASTIC, T.MAT_UBER):
                if m in mats_present:
                    d = d | ((mat == float(m)) & (kd_on | ks_on))
        return d

    # ---- camera (camera.rs:77-90)
    PI_ = ps.cam_proj_inv
    CW = ps.cam_to_world
    cam_ox = float(CW[0, 3])
    cam_oy = float(CW[1, 3])
    cam_oz = float(CW[2, 3])

    FILTER_R = float(ps.filter_radius)

    def _fjit(u):
        # tent pixel filter via filter importance sampling (camera.py
        # filter_jitter); FILTER_R == 0 keeps the box jitter
        if not FILTER_R:
            return u
        half = jnp.minimum(u, 1.0 - u)
        mag = 1.0 - jnp.sqrt(jnp.maximum(2.0 * half, 0.0))
        return 0.5 + FILTER_R * jnp.where(u < 0.5, -mag, mag)

    def camera_ray(pxf, pyf, ju, jv):
        u = (pxf + _fjit(ju)) * (1.0 / max(W - 1, 1))
        v = (pyf + _fjit(jv)) * (1.0 / max(H - 1, 1))
        nx_ = u * 2.0 - 1.0
        ny_ = v * 2.0 - 1.0
        tcx = PI_[0, 0] * nx_ + PI_[0, 1] * ny_ + PI_[0, 2] + PI_[0, 3]
        tcy = PI_[1, 0] * nx_ + PI_[1, 1] * ny_ + PI_[1, 2] + PI_[1, 3]
        tcz = PI_[2, 0] * nx_ + PI_[2, 1] * ny_ + PI_[2, 2] + PI_[2, 3]
        twx = CW[0, 0] * tcx + CW[0, 1] * tcy + CW[0, 2] * tcz + CW[0, 3]
        twy = CW[1, 0] * tcx + CW[1, 1] * tcy + CW[1, 2] * tcz + CW[1, 3]
        twz = CW[2, 0] * tcx + CW[2, 1] * tcy + CW[2, 2] * tcz + CW[2, 3]
        dx, dy, dz = normalize3(twx - cam_ox, twy - cam_oy, twz - cam_oz)
        return dx, dy, dz

    # ------------------------------------------------------------------
    def _remap_rough_k(r):
        """pbrt roughness->alpha polynomial, in-kernel (for imagemap
        roughness whose value is only known per hit)."""
        x = jnp.log(jnp.maximum(r, 1e-3))
        return (1.62142 + 0.819955 * x + 0.1734 * x * x
                + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)

    def apply_images(iref, c, attr, hit, miss):
        """Per-bounce texture fetches: one bounded sweep per active slot
        class (imagemap Kd/Ks/roughness/opacity/Kr/Kt multiplied or
        applied into the matching attr rows), plus the env-map
        background for missed lanes (miss shader lib.rs:120-139).
        Returns (attr, bg_rgb)."""
        if HAS_IMG_MATS:
            attr = dict(attr)
            for cls in ACTIVE_IMG_CLASSES:
                sel_img = (attr[f"ib_{cls}"] >= 0.0) & hit
                if "atlas" in ABLATE:
                    # cost-partition gate (RENE_MEGA_ABLATE=atlas): keep
                    # the attr application but replace the paged VMEM
                    # fetch with a flat 0.5 — isolates the atlas-fetch
                    # share of texture-heavy scenes. Renders are wrong.
                    flat = attr["u"] * 0.0 + 0.5
                    iv = (flat, flat, flat)
                else:
                    iv = fetch_image(iref, attr["u"], attr["v"],
                                     attr[f"iw_{cls}"], attr[f"ih_{cls}"],
                                     attr[f"ib_{cls}"], sel_img,
                                     *CLS_PRANGE[cls])
                if cls == "kd":
                    rows = ("abr", "abg", "abb")
                elif cls == "ks":
                    rows = ("kr", "kg", "kb")
                elif cls == "kr":
                    rows = ("krr", "krg", "krb")
                elif cls == "kt":
                    rows = ("ktr", "ktg", "ktb")
                elif cls in ("ru", "rv"):
                    key = "ax" if cls == "ru" else "ay"
                    r = attr[key] * iv[0]
                    if HAS_RRM:
                        r = jnp.where(attr["rrm"] > 0.5,
                                      _remap_rough_k(r), r)
                    attr[key] = jnp.where(sel_img, r, attr[key])
                    continue
                else:  # op: op = 1 - v; v multiplies op-less kr2/kt2
                    for ch, okey in enumerate(("opr", "opg", "opb")):
                        attr[okey] = jnp.where(sel_img, 1.0 - iv[ch],
                                               attr[okey])
                    for ch, keys in enumerate(
                            (("krr", "ktr"), ("krg", "ktg"),
                             ("krb", "ktb"))):
                        for key in keys:
                            attr[key] = jnp.where(
                                sel_img, attr[key] * iv[ch], attr[key])
                    continue
                for ch, key in enumerate(rows):
                    attr[key] = jnp.where(sel_img, attr[key] * iv[ch],
                                          attr[key])
        if BG_IMG is not None:
            bm = ps.bg_matrix
            bdx = (bm[0, 0] * c["dx"] + bm[0, 1] * c["dy"]
                   + bm[0, 2] * c["dz"])
            bdy = (bm[1, 0] * c["dx"] + bm[1, 1] * c["dy"]
                   + bm[1, 2] * c["dz"])
            bdz = (bm[2, 0] * c["dx"] + bm[2, 1] * c["dy"]
                   + bm[2, 2] * c["dz"])
            bu_, bv_ = sphere_uv_of(bdx, bdy, bdz)
            base, bw_, bh_ = BG_IMG
            if "atlas" in ABLATE:
                flat = c["dx"] * 0.0 + 0.5
                bg = (flat, flat, flat)
            else:
                bg = fetch_image(iref, bu_, bv_,
                                 jnp.full(SHAPE, float(bw_)),
                                 jnp.full(SHAPE, float(bh_)),
                                 jnp.full(SHAPE, float(base)), miss,
                                 BG_PMIN, BG_PMAX)
            return attr, (bg[0] * ps.background[0],
                          bg[1] * ps.background[1],
                          bg[2] * ps.background[2])
        if ps.bg_checker is not None:
            # checker background evaluated inline from the miss uv —
            # exact (no bake-resolution error), ~10 VPU ops
            bm = ps.bg_matrix
            bdx = (bm[0, 0] * c["dx"] + bm[0, 1] * c["dy"]
                   + bm[0, 2] * c["dz"])
            bdy = (bm[1, 0] * c["dx"] + bm[1, 1] * c["dy"]
                   + bm[1, 2] * c["dz"])
            bdz = (bm[2, 0] * c["dx"] + bm[2, 1] * c["dy"]
                   + bm[2, 2] * c["dz"])
            bu_, bv_ = sphere_uv_of(bdx, bdy, bdz)
            us_, vs_, ev_, od_ = ps.bg_checker
            xs = bu_ * us_
            ys = bv_ * vs_
            even = ((xs - 2.0 * jnp.floor(0.5 * xs) < 1.0)
                    == (ys - 2.0 * jnp.floor(0.5 * ys) < 1.0))
            return attr, tuple(
                jnp.where(even, ev_[ch], od_[ch]) * ps.background[ch]
                for ch in range(3))
        return attr, ps.background

    def kernel(seed_ref, *refs):
        import jax.numpy as jnp
        if NC and HBM_MESH:
            # (hbm geometry ref, box table ref) lead the inputs; the DMA
            # scratch buffer + semaphore trail the outputs
            main = (refs[0], refs[1], refs[-2], refs[-1])
            refs = refs[2:-2]
        elif NC:
            main, refs = (refs[0], refs[1]), refs[2:]
        else:
            main = None
        inst_refs = []
        for _ in range(NINST):
            inst_refs.append((refs[0], refs[1], refs[2]))
            refs = refs[3:]
        mref = (main, inst_refs) if (NC or NINST) else None
        if HAS_IMG:
            iref, refs = refs[0], refs[1:]
        else:
            iref = None
        if HAS_ENV:
            eref, refs = refs[0], refs[1:]
        else:
            eref = None
        if N_SPH:
            _sref_hold.clear()
            _sref_hold.append(refs[0])
            refs = refs[1:]
        if LIGHT_TABLE:
            _lref_hold.clear()
            _lref_hold.append(refs[0])
            refs = refs[1:]
        (px_ref, py_ref, rad_r, rad_g, rad_b,
         an_x, an_y, an_z, aa_r, aa_g, aa_b, rays_out) = refs
        pid = pl.program_id(0)
        if not interpret:
            pltpu.prng_seed(seed_ref[0] + pid * jnp.int32(65537))

        pxf = px_ref[:]
        pyf = py_ref[:]

        # sample-in-tile packing: the lane's sample slot is static in
        # the tile layout (lane j covers pixel j % ppb at slot j // ppb)
        pid32 = (pxf + pyf * float(W)).astype(jnp.int32)
        if pack > 1:
            ppb = (SHAPE[0] * 128) // pack
            slot_i = (jax.lax.broadcasted_iota(jnp.int32, SHAPE, 0) * 128
                      + jax.lax.broadcasted_iota(jnp.int32, SHAPE, 1)
                      ) // ppb
            # decorrelate the interpret-mode stream per (pixel, slot)
            pid32 = pid32 + slot_i * jnp.int32(NPIX)
        # interpret-mode RNG stream state (pass-through on TPU)
        lane_i = pltpu.bitcast(pid32, jnp.uint32) \
            if not interpret else jax.lax.bitcast_convert_type(
                pid32, jnp.uint32)
        seed_u = pltpu.bitcast(
            jnp.full(SHAPE, seed_ref[0] + pid * jnp.int32(65537),
                     jnp.int32), jnp.uint32) if not interpret else \
            jax.lax.bitcast_convert_type(
                jnp.full(SHAPE, seed_ref[0] + pid * jnp.int32(65537),
                         jnp.int32), jnp.uint32)
        st0 = (lane_i * jnp.uint32(2654435761) ^ seed_u) | jnp.uint32(1)
        if SOBOL:
            # per-slot Owen scrambling key: each slot is an independent
            # (0,2)-sequence chunk of the pixel (same model as the
            # per-chunk seed mix in render.py's driver loop)
            skey = seed_u
            if pack > 1:
                slot_u = pltpu.bitcast(slot_i, jnp.uint32) \
                    if not interpret else jax.lax.bitcast_convert_type(
                        slot_i, jnp.uint32)
                skey = seed_u ^ (slot_u * jnp.uint32(0x9E3779B1))
            pixkey = sob_pixkey(pxf, pyf, skey)
            izero0 = (pxf * 0.0).astype(jnp.int32)
            ju0, jv0 = ld2(izero0, pixkey, izero0, SLOT_CAM)
        else:
            ju0, st0 = uniform(st0)
            jv0, st0 = uniform(st0)
        dx0, dy0, dz0 = camera_ray(pxf, pyf, ju0, jv0)

        def cond(c):
            return jnp.any(c["sample"] < num_samples)

        def body(c):
            active = c["sample"] < num_samples
            cr, cg, cb = c["cr"], c["cg"], c["cb"]
            depth = c["depth"]
            rays = c["rays"] + jnp.where(active, 1.0, 0.0) \
                * (1.0 + len(ps.lights) + (1.0 if E > 0 else 0.0))

            t, attr = trace_closest(c["ox"], c["oy"], c["oz"],
                                    c["dx"], c["dy"], c["dz"], TMIN, mref)
            if "dbltris" in ABLATE:
                # debug profiling only: a second closest-hit trace on an
                # imperceptibly perturbed ray (distinct expressions, so
                # neither CSE nor DCE can elide it), folded in so the
                # timing delta vs base = one full trace_closest.
                t2, a2 = trace_closest(c["ox"], c["oy"], c["oz"],
                                       c["dx"] + 1e-12, c["dy"] + 1e-12,
                                       c["dz"] + 1e-12, TMIN, mref)
                t = jnp.minimum(t, t2)
                attr = {k: jnp.minimum(attr[k], a2[k]) for k in attr}
            hit = t < BIG
            miss = active & ~hit
            attr, bg = apply_images(iref, c, attr, hit, miss)
            rr_ = c["rr"] + jnp.where(miss, cr * bg[0], 0.0)
            rg_ = c["rg"] + jnp.where(miss, cg * bg[1], 0.0)
            rb_ = c["rb"] + jnp.where(miss, cb * bg[2], 0.0)
            alive = active & hit

            # hit point / normal / frame
            hx = c["ox"] + t * c["dx"]
            hy = c["oy"] + t * c["dy"]
            hz = c["oz"] + t * c["dz"]
            nx, ny, nz = normalize3(attr["nx"], attr["ny"], attr["nz"])
            wox, woy, woz = -c["dx"], -c["dy"], -c["dz"]
            ux, uy, uz, vx, vy, vz = onb_from_w(nx, ny, nz)

            # emitter hit (one-sided)
            al_on = alive & ((attr["alr"] != 0.0) | (attr["alg"] != 0.0)
                             | (attr["alb"] != 0.0)) \
                & (dot3(wox, woy, woz, nx, ny, nz) > 0.0)
            rr_ = rr_ + jnp.where(al_on, cr * attr["alr"], 0.0)
            rg_ = rg_ + jnp.where(al_on, cg * attr["alg"], 0.0)
            rb_ = rb_ + jnp.where(al_on, cb * attr["alb"], 0.0)

            # AOVs at depth 0
            first = alive & (depth == 0)
            anx = c["anx"] + jnp.where(first, nx, 0.0)
            any_ = c["any"] + jnp.where(first, ny, 0.0)
            anz = c["anz"] + jnp.where(first, nz, 0.0)
            aar = c["aar"] + jnp.where(first, attr["abr"], 0.0)
            aag = c["aag"] + jnp.where(first, attr["abg"], 0.0)
            aab = c["aab"] + jnp.where(first, attr["abb"], 0.0)

            # local wo
            lox_, loy_, loz_ = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                        wox, woy, woz)

            # NEE for distant lights ("dist" ablation gate: debug-only
            # cost partition, tpu_session_r4u2 — dragon's only light is
            # distant, so the emitter-MIS "nee" gate is inert there)
            def _dist_body(carry, lt6, hx=hx, hy=hy, hz=hz, ux=ux,
                           uy=uy, uz=uz, vx=vx, vy=vy, vz=vz, nx=nx,
                           ny=ny, nz=nz, attr=attr, lox_=lox_,
                           loy_=loy_, loz_=loz_, alive=alive, cr=cr,
                           cg=cg, cb=cb, mref=mref):
                rr_, rg_, rb_ = carry
                ldx, ldy, ldz, lcr, lcg, lcb = lt6
                zf = hx * 0.0
                bdx, bdy, bdz = zf + ldx, zf + ldy, zf + ldz
                shadowed = trace_any(hx, hy, hz, bdx, bdy, bdz,
                                     TMIN, 1e5, mref,
                                     dir_scalars=(ldx, ldy, ldz)
                                     if CONST_DIR else None)
                lwx, lwy, lwz = to_local(ux, uy, uz, vx, vy, vz,
                                         nx, ny, nz, bdx, bdy, bdz)
                fe_r, fe_g, fe_b, _ = bsdf_eval(attr, lox_, loy_, loz_,
                                                lwx, lwy, lwz)
                cosl = jnp.abs(ldx * nx + ldy * ny + ldz * nz)
                okl = alive & ~shadowed
                rr_ = rr_ + jnp.where(okl, cr * fe_r * cosl * lcr, 0.0)
                rg_ = rg_ + jnp.where(okl, cg * fe_g * cosl * lcg, 0.0)
                rb_ = rb_ + jnp.where(okl, cb * fe_b * cosl * lcb, 0.0)
                return rr_, rg_, rb_

            if "dist" not in ABLATE:
                rr_, rg_, rb_ = fold_lights((rr_, rg_, rb_), _dist_body)

            # scatter
            st = c["st"]
            if SOBOL:
                u1, u2 = ld2(c["sample"], pixkey, depth, SLOT_BSDF)
                u_coin, ul = ld2(c["sample"], pixkey, depth, SLOT_COIN)
            else:
                u_coin, st = uniform(st)
                u1, st = uniform(st)
                u2, st = uniform(st)
                ul, st = uniform(st)
            swx, swy, swz, sfr, sfg, sfb, spdf = bsdf_sample(
                attr, lox_, loy_, loz_, u_coin, u1, u2, ul)
            # to world
            swx, swy, swz = to_world(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                     swx, swy, swz)

            if (E > 0 or HAS_ENV) and "nee" not in ABLATE:
                if SOBOL:
                    ue1, ue2 = ld2(c["sample"], pixkey, depth,
                                   SLOT_NEE1)
                    ue3, ue4 = ld2(c["sample"], pixkey, depth,
                                   SLOT_NEE2)
                    coin, upick = ld2(c["sample"], pixkey, depth,
                                      SLOT_MISC)
                else:
                    coin, st = uniform(st)
                    ue1, st = uniform(st)
                    ue2, st = uniform(st)
                    ue3, st = uniform(st)
                    ue4, st = uniform(st)
                    if HAS_ENV and E > 0:
                        upick, st = uniform(st)
                # the env strategy reuses ue1..ue4 — only one of the two
                # light samplers is consumed per lane, and the pick
                # (upick) is an independent draw
                if E > 0:
                    ls_wx, ls_wy, ls_wz = sample_emit(hx, hy, hz, ue1,
                                                      ue2, ue3, ue4)
                if HAS_ENV:
                    ex_, ey_, ez_ = env_strategy(eref, ue1, ue2, ue3, ue4)
                    if E > 0:
                        tke = upick * float(E + 1) < 1.0
                        ls_wx = jnp.where(tke, ex_, ls_wx)
                        ls_wy = jnp.where(tke, ey_, ls_wy)
                        ls_wz = jnp.where(tke, ez_, ls_wz)
                    else:
                        ls_wx, ls_wy, ls_wz = ex_, ey_, ez_
                take_light = (coin > 0.5) & is_diffuse(attr)
                wx_ = jnp.where(take_light, ls_wx, swx)
                wy_ = jnp.where(take_light, ls_wy, swy)
                wz_ = jnp.where(take_light, ls_wz, swz)
                llx, lly, llz = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                         ls_wx, ls_wy, ls_wz)
                fe_r, fe_g, fe_b, fe_pdf = bsdf_eval(attr, lox_, loy_, loz_,
                                                     llx, lly, llz)
                f_r = jnp.where(take_light, fe_r, sfr)
                f_g = jnp.where(take_light, fe_g, sfg)
                f_b = jnp.where(take_light, fe_b, sfb)
                pdf_b = jnp.where(take_light, fe_pdf, spdf)
                lp_ = trace_emit_pdf(hx, hy, hz, wx_, wy_, wz_) \
                    if E > 0 else 0.0
                if HAS_ENV:
                    lp_ = lp_ + env_pdf_dir(eref, wx_, wy_, wz_)
                lpdf = lp_ / float(E + (1 if HAS_ENV else 0))
                mis = is_diffuse(attr)
                pdf = jnp.where(mis, 0.5 * pdf_b + 0.5 * lpdf, spdf)
                f_r = jnp.where(mis, f_r, sfr)
                f_g = jnp.where(mis, f_g, sfg)
                f_b = jnp.where(mis, f_b, sfb)
                wx_ = jnp.where(mis, wx_, swx)
                wy_ = jnp.where(mis, wy_, swy)
                wz_ = jnp.where(mis, wz_, swz)
            else:
                wx_, wy_, wz_, f_r, f_g, f_b, pdf = (swx, swy, swz, sfr,
                                                     sfg, sfb, spdf)

            alive = alive & (pdf >= 1e-5)
            cosw = jnp.abs(wx_ * nx + wy_ * ny + wz_ * nz)
            scale = cosw / jnp.maximum(pdf, 1e-20)
            cr = cr * f_r * scale
            cg = cg * f_g * scale
            cb = cb * f_b * scale
            alive = alive & ((cr != 0.0) | (cg != 0.0) | (cb != 0.0))

            if use_rr:
                if SOBOL:
                    rrv, _ = ld2(c["sample"], pixkey, depth, SLOT_RR)
                else:
                    rrv, st = uniform(st)
                p_cont = jnp.clip(jnp.maximum(cr, jnp.maximum(cg, cb)),
                                  0.0, 1.0)
                do_rr = depth > RR_START
                alive = alive & (~do_rr | (rrv <= p_cont))
                inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)
                keep = do_rr & alive
                cr = jnp.where(keep, cr * inv_p, cr)
                cg = jnp.where(keep, cg * inv_p, cg)
                cb = jnp.where(keep, cb * inv_p, cb)

            depth = depth + 1
            alive = alive & (depth < MAXD)

            # regeneration
            finished = active & ~alive
            sample = c["sample"] + jnp.where(finished, 1, 0)
            regen = finished & (sample < num_samples)
            if SOBOL:
                cj1, cj2 = ld2(sample, pixkey, sample * 0, SLOT_CAM)
            else:
                cj1, st = uniform(st)
                cj2, st = uniform(st)
            cdx, cdy, cdz = camera_ray(pxf, pyf, cj1, cj2)

            def pick3(a1, a2, b2c):
                return jnp.where(regen, a1, jnp.where(alive, a2, b2c))

            out = {
                "ox": pick3(jnp.full(SHAPE, cam_ox), hx, c["ox"]),
                "oy": pick3(jnp.full(SHAPE, cam_oy), hy, c["oy"]),
                "oz": pick3(jnp.full(SHAPE, cam_oz), hz, c["oz"]),
                "dx": pick3(cdx, wx_, c["dx"]),
                "dy": pick3(cdy, wy_, c["dy"]),
                "dz": pick3(cdz, wz_, c["dz"]),
                "cr": pick3(jnp.ones(SHAPE), cr, c["cr"]),
                "cg": pick3(jnp.ones(SHAPE), cg, c["cg"]),
                "cb": pick3(jnp.ones(SHAPE), cb, c["cb"]),
                "depth": jnp.where(regen, 0, jnp.where(alive, depth,
                                                       c["depth"])),
                "sample": sample,
                "rr": rr_, "rg": rg_, "rb": rb_,
                "anx": anx, "any": any_, "anz": anz,
                "aar": aar, "aag": aag, "aab": aab,
                "rays": rays,
                "st": st,
            }
            return out

        def body_vol(c):
            """volpath bounce (lib.rs:477-803 semantics, mirrors
            integrators/volpath.py): medium distance sampling, phase NEE
            through tr marching, surface NEE with transmittance, None-
            material passthrough, medium-interface tracking, no RR."""
            active = c["sample"] < num_samples
            cr, cg, cb = c["cr"], c["cg"], c["cb"]
            med = c["med"]
            depth = c["depth"]
            rays = c["rays"] + jnp.where(active, 1.0, 0.0) \
                * (1.0 + len(ps.lights) + (1.0 if E > 0 else 0.0))

            t, attr = trace_closest(c["ox"], c["oy"], c["oz"],
                                    c["dx"], c["dy"], c["dz"], TMIN, mref)
            hit = t < BIG
            miss = active & ~hit
            attr, bg = apply_images(iref, c, attr, hit, miss)
            rr_ = c["rr"] + jnp.where(miss, cr * bg[0], 0.0)
            rg_ = c["rg"] + jnp.where(miss, cg * bg[1], 0.0)
            rb_ = c["rb"] + jnp.where(miss, cb * bg[2], 0.0)
            alive = active & hit

            hx = c["ox"] + t * c["dx"]
            hy = c["oy"] + t * c["dy"]
            hz = c["oz"] + t * c["dz"]
            nx, ny, nz = normalize3(attr["nx"], attr["ny"], attr["nz"])
            wox, woy, woz = -c["dx"], -c["dy"], -c["dz"]
            ux, uy, uz, vx, vy, vz = onb_from_w(nx, ny, nz)
            mat_none = attr["mat"] == float(T.MAT_NONE)

            # -- medium sampling along the segment (lib.rs:561-565)
            st = c["st"]
            sampled, t_med, mw, st = med_sample(med, t, st)
            sampled = sampled & alive
            cr = jnp.where(alive, cr * mw[0], cr)
            cg = jnp.where(alive, cg * mw[1], cg)
            cb = jnp.where(alive, cb * mw[2], cb)
            mpx = c["ox"] + t_med * c["dx"]
            mpy = c["oy"] + t_med * c["dy"]
            mpz = c["oz"] + t_med * c["dz"]

            # ======== medium interaction ========
            def _med_dist(carry, lt6, mpx=mpx, mpy=mpy, mpz=mpz,
                          wox=wox, woy=woy, woz=woz, med=med,
                          sampled=sampled, cr=cr, cg=cg, cb=cb, mref=mref):
                rr_, rg_, rb_ = carry
                ldx, ldy, ldz, lcr, lcg, lcb = lt6
                zf = mpx * 0.0
                trv = tr_march(mpx, mpy, mpz, zf + ldx, zf + ldy,
                               zf + ldz, med, False, mref)
                cosw = wox * ldx + woy * ldy + woz * ldz
                phase = med_phase(med, cosw)
                rr_ = rr_ + jnp.where(sampled, cr * trv[0] * phase * lcr,
                                      0.0)
                rg_ = rg_ + jnp.where(sampled, cg * trv[1] * phase * lcg,
                                      0.0)
                rb_ = rb_ + jnp.where(sampled, cb * trv[2] * phase * lcb,
                                      0.0)
                return rr_, rg_, rb_

            rr_, rg_, rb_ = fold_lights((rr_, rg_, rb_), _med_dist)
            m_dx, m_dy, m_dz, st = med_sample_p(med, wox, woy, woz, st)
            if E > 0:
                ue1, st = uniform(st)
                ue2, st = uniform(st)
                ue3, st = uniform(st)
                ue4, st = uniform(st)
                ls_x, ls_y, ls_z = sample_emit(mpx, mpy, mpz,
                                               ue1, ue2, ue3, ue4)
                epdf = trace_emit_pdf(mpx, mpy, mpz,
                                      ls_x, ls_y, ls_z) / float(E)
                tr_e = tr_march(mpx, mpy, mpz, ls_x, ls_y, ls_z,
                                med, True, mref)
                cosw = wox * ls_x + woy * ls_y + woz * ls_z
                phase_e = med_phase(med, cosw) \
                    / jnp.maximum(epdf, 1e-5)
                ok_e = sampled & (epdf > 1e-5)
                rr_ = rr_ + jnp.where(ok_e, cr * tr_e[0] * phase_e, 0.0)
                rg_ = rg_ + jnp.where(ok_e, cg * tr_e[1] * phase_e, 0.0)
                rb_ = rb_ + jnp.where(ok_e, cb * tr_e[2] * phase_e, 0.0)

            # ======== surface interaction ========
            surf = alive & ~sampled
            al_on = surf & ((attr["alr"] != 0.0) | (attr["alg"] != 0.0)
                            | (attr["alb"] != 0.0)) \
                & (dot3(wox, woy, woz, nx, ny, nz) > 0.0)
            rr_ = rr_ + jnp.where(al_on, cr * attr["alr"], 0.0)
            rg_ = rg_ + jnp.where(al_on, cg * attr["alg"], 0.0)
            rb_ = rb_ + jnp.where(al_on, cb * attr["alb"], 0.0)

            first = surf & (depth == 0)
            anx = c["anx"] + jnp.where(first, nx, 0.0)
            any_ = c["any"] + jnp.where(first, ny, 0.0)
            anz = c["anz"] + jnp.where(first, nz, 0.0)
            aar = c["aar"] + jnp.where(first, attr["abr"], 0.0)
            aag = c["aag"] + jnp.where(first, attr["abg"], 0.0)
            aab = c["aab"] + jnp.where(first, attr["abb"], 0.0)

            lox_, loy_, loz_ = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                        wox, woy, woz)
            surf_scatter = surf & ~mat_none

            # surface NEE with transmittance (occlusion by a non-None
            # surface ends the march with tr contribution 0)
            def _surf_dist(carry, lt6, hx=hx, hy=hy, hz=hz, ux=ux,
                           uy=uy, uz=uz, vx=vx, vy=vy, vz=vz, nx=nx,
                           ny=ny, nz=nz, attr=attr, lox_=lox_,
                           loy_=loy_, loz_=loz_, med=med,
                           surf_scatter=surf_scatter, cr=cr, cg=cg,
                           cb=cb, mref=mref):
                rr_, rg_, rb_ = carry
                ldx, ldy, ldz, lcr, lcg, lcb = lt6
                zf = hx * 0.0
                bdx, bdy, bdz = zf + ldx, zf + ldy, zf + ldz
                trv = tr_march(hx, hy, hz, bdx, bdy, bdz, med, False,
                               mref)
                lwx, lwy, lwz = to_local(ux, uy, uz, vx, vy, vz,
                                         nx, ny, nz, bdx, bdy, bdz)
                fe_r, fe_g, fe_b, _ = bsdf_eval(attr, lox_, loy_, loz_,
                                                lwx, lwy, lwz)
                cosl = jnp.abs(ldx * nx + ldy * ny + ldz * nz)
                rr_ = rr_ + jnp.where(surf_scatter, cr * trv[0] * fe_r
                                      * cosl * lcr, 0.0)
                rg_ = rg_ + jnp.where(surf_scatter, cg * trv[1] * fe_g
                                      * cosl * lcg, 0.0)
                rb_ = rb_ + jnp.where(surf_scatter, cb * trv[2] * fe_b
                                      * cosl * lcb, 0.0)
                return rr_, rg_, rb_

            rr_, rg_, rb_ = fold_lights((rr_, rg_, rb_), _surf_dist)

            # scatter with emitter MIS (same estimator as the path body)
            if SOBOL:
                u1, u2 = ld2(c["sample"], pixkey, depth, SLOT_BSDF)
                u_coin, ul = ld2(c["sample"], pixkey, depth, SLOT_COIN)
            else:
                u_coin, st = uniform(st)
                u1, st = uniform(st)
                u2, st = uniform(st)
                ul, st = uniform(st)
            swx, swy, swz, sfr, sfg, sfb, spdf = bsdf_sample(
                attr, lox_, loy_, loz_, u_coin, u1, u2, ul)
            swx, swy, swz = to_world(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                     swx, swy, swz)
            if E > 0 or HAS_ENV:
                if SOBOL:
                    ue1, ue2 = ld2(c["sample"], pixkey, depth,
                                   SLOT_NEE1)
                    ue3, ue4 = ld2(c["sample"], pixkey, depth,
                                   SLOT_NEE2)
                    coin, upick = ld2(c["sample"], pixkey, depth,
                                      SLOT_MISC)
                else:
                    coin, st = uniform(st)
                    ue1, st = uniform(st)
                    ue2, st = uniform(st)
                    ue3, st = uniform(st)
                    ue4, st = uniform(st)
                    if HAS_ENV and E > 0:
                        upick, st = uniform(st)
                # the env strategy reuses ue1..ue4 — only one of the two
                # light samplers is consumed per lane, and the pick
                # (upick) is an independent draw
                if E > 0:
                    ls_wx, ls_wy, ls_wz = sample_emit(hx, hy, hz, ue1,
                                                      ue2, ue3, ue4)
                if HAS_ENV:
                    ex_, ey_, ez_ = env_strategy(eref, ue1, ue2, ue3, ue4)
                    if E > 0:
                        tke = upick * float(E + 1) < 1.0
                        ls_wx = jnp.where(tke, ex_, ls_wx)
                        ls_wy = jnp.where(tke, ey_, ls_wy)
                        ls_wz = jnp.where(tke, ez_, ls_wz)
                    else:
                        ls_wx, ls_wy, ls_wz = ex_, ey_, ez_
                take_light = (coin > 0.5) & is_diffuse(attr)
                wx_ = jnp.where(take_light, ls_wx, swx)
                wy_ = jnp.where(take_light, ls_wy, swy)
                wz_ = jnp.where(take_light, ls_wz, swz)
                llx, lly, llz = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                         ls_wx, ls_wy, ls_wz)
                fe_r, fe_g, fe_b, fe_pdf = bsdf_eval(attr, lox_, loy_, loz_,
                                                     llx, lly, llz)
                f_r = jnp.where(take_light, fe_r, sfr)
                f_g = jnp.where(take_light, fe_g, sfg)
                f_b = jnp.where(take_light, fe_b, sfb)
                pdf_b = jnp.where(take_light, fe_pdf, spdf)
                lp_ = trace_emit_pdf(hx, hy, hz, wx_, wy_, wz_) \
                    if E > 0 else 0.0
                if HAS_ENV:
                    lp_ = lp_ + env_pdf_dir(eref, wx_, wy_, wz_)
                lpdf = lp_ / float(E + (1 if HAS_ENV else 0))
                mis = is_diffuse(attr)
                pdf = jnp.where(mis, 0.5 * pdf_b + 0.5 * lpdf, spdf)
                f_r = jnp.where(mis, f_r, sfr)
                f_g = jnp.where(mis, f_g, sfg)
                f_b = jnp.where(mis, f_b, sfb)
                wx_ = jnp.where(mis, wx_, swx)
                wy_ = jnp.where(mis, wy_, swy)
                wz_ = jnp.where(mis, wz_, swz)
            else:
                wx_, wy_, wz_, f_r, f_g, f_b, pdf = (swx, swy, swz, sfr,
                                                     sfg, sfb, spdf)

            cosw = jnp.abs(wx_ * nx + wy_ * ny + wz_ * nz)
            scale = cosw / jnp.maximum(pdf, 1e-20)
            sc_r = cr * f_r * scale
            sc_g = cg * f_g * scale
            sc_b = cb * f_b * scale

            # next ray per lane kind
            new_ox = jnp.where(sampled, mpx, jnp.where(surf, hx, c["ox"]))
            new_oy = jnp.where(sampled, mpy, jnp.where(surf, hy, c["oy"]))
            new_oz = jnp.where(sampled, mpz, jnp.where(surf, hz, c["oz"]))
            new_dx = jnp.where(sampled, m_dx,
                               jnp.where(surf_scatter, wx_, c["dx"]))
            new_dy = jnp.where(sampled, m_dy,
                               jnp.where(surf_scatter, wy_, c["dy"]))
            new_dz = jnp.where(sampled, m_dz,
                               jnp.where(surf_scatter, wz_, c["dz"]))
            cr = jnp.where(surf_scatter, sc_r, cr)
            cg = jnp.where(surf_scatter, sc_g, cg)
            cb = jnp.where(surf_scatter, sc_b, cb)
            alive = alive & (sampled | (surf & (mat_none | (pdf >= 1e-5))))

            # medium interface crossing at surfaces (lib.rs:775-779)
            crossing_out = dot3(wox, woy, woz, nx, ny, nz) < 0.0
            new_med = jnp.where(
                surf, jnp.where(crossing_out, attr["emed"], attr["imed"]),
                med)

            alive = alive & ((cr != 0.0) | (cg != 0.0) | (cb != 0.0))
            depth = depth + 1
            alive = alive & (depth < MAXD)

            # regeneration
            finished = active & ~alive
            sample = c["sample"] + jnp.where(finished, 1, 0)
            regen = finished & (sample < num_samples)
            if SOBOL:
                cj1, cj2 = ld2(sample, pixkey, sample * 0, SLOT_CAM)
            else:
                cj1, st = uniform(st)
                cj2, st = uniform(st)
            cdx, cdy, cdz = camera_ray(pxf, pyf, cj1, cj2)

            def pick3(a1, a2, b2c):
                return jnp.where(regen, a1, jnp.where(alive, a2, b2c))

            return {
                "ox": pick3(jnp.full(SHAPE, cam_ox), new_ox, c["ox"]),
                "oy": pick3(jnp.full(SHAPE, cam_oy), new_oy, c["oy"]),
                "oz": pick3(jnp.full(SHAPE, cam_oz), new_oz, c["oz"]),
                "dx": pick3(cdx, new_dx, c["dx"]),
                "dy": pick3(cdy, new_dy, c["dy"]),
                "dz": pick3(cdz, new_dz, c["dz"]),
                "cr": pick3(jnp.ones(SHAPE), cr, c["cr"]),
                "cg": pick3(jnp.ones(SHAPE), cg, c["cg"]),
                "cb": pick3(jnp.ones(SHAPE), cb, c["cb"]),
                "depth": jnp.where(regen, 0, jnp.where(alive, depth,
                                                       c["depth"])),
                "sample": sample,
                "med": jnp.where(regen, 0.0,
                                 jnp.where(alive, new_med, med)),
                "rr": rr_, "rg": rg_, "rb": rb_,
                "anx": anx, "any": any_, "anz": anz,
                "aar": aar, "aag": aag, "aab": aab,
                "rays": rays,
                "st": st,
            }

        # derive all constant-valued carries from loaded data: Mosaic
        # rejects relayouts of replicated splat constants in while-carries
        zero = pxf * 0.0
        one = zero + 1.0
        izero = zero.astype(jnp.int32)
        carry = {
            "ox": zero + cam_ox, "oy": zero + cam_oy, "oz": zero + cam_oz,
            "dx": dx0, "dy": dy0, "dz": dz0,
            "cr": one, "cg": one, "cb": one,
            "depth": izero,
            "sample": izero,
            "rr": zero, "rg": zero, "rb": zero,
            "anx": zero, "any": zero, "anz": zero,
            "aar": zero, "aag": zero, "aab": zero,
            "rays": zero,
            "st": st0,
        }
        if VOL:
            carry["med"] = zero
        out = jax.lax.while_loop(cond, body_vol if VOL else body, carry)
        rad_r[:] = out["rr"]
        rad_g[:] = out["rg"]
        rad_b[:] = out["rb"]
        an_x[:] = out["anx"]
        an_y[:] = out["any"]
        an_z[:] = out["anz"]
        aa_r[:] = out["aar"]
        aa_g[:] = out["aag"]
        aa_b[:] = out["aab"]
        rays_out[:] = out["rays"]

    if not wave_k:
        return kernel

    # ------------------------------------------------------------------
    # Wavefront kernel: one launch advances every alive lane by wave_k
    # bounces. The host sorts/compacts the ray state between launches
    # (pallas_wave.py) so every tile re-enters the march with coherent
    # rays — cross-tile redistribution, the fix for the any-lane SIMT
    # wall of the cluster march. Same estimator as the megakernel body
    # (NEE + 50/50 emitter MIS + RR) INCLUDING path regeneration: a
    # terminated lane starts its pixel's next sample until `want`
    # samples are done (megakernel occupancy under redistribution),
    # then parks at DEAD_ORIGIN so dead lanes never enter an AABB.

    # --- next-launch sort-key helpers (WROW_KEY), shared by the path
    # and volpath wave bounces. Key layout (int bits, stored bitcast as
    # f32 — bit 30 is OR'd into every key so all keys are positive
    # NORMAL floats, ordered exactly like their int bits: the host sort
    # is a bare jnp.argsort of this row, no key math, no bitcast):
    #   alive, cluster hit:  oct(new dir)<<24 | winner cluster id
    #   alive, other hit:    oct<<24 | 1<<23 | 18-bit hit Morton
    #   regenerated lane:    oct(cam dir)<<24 | 1<<22 | pixel block
    #   dead/parked:         0x3F000000 (-> 0x7F000000, sorts last)
    # Cluster ids are surface-adaptive origin bins (one 128-tri
    # Morton-ordered patch), much finer on the actual geometry than
    # the uniform scene-bbox cells the XLA key quantizes.
    wlo, wext = wave_bounds if wave_bounds is not None else \
        ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))

    def _oct_of(a, b, g):
        return (jnp.where(a < 0.0, 4, 0)
                + jnp.where(b < 0.0, 2, 0)
                + jnp.where(g < 0.0, 1, 0)).astype(jnp.int32)

    def _mpart(v):  # spread 6 low bits to every 3rd bit
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def _q6(v, ax):
        return jnp.clip((v - wlo[ax]) * (64.0 / wext[ax]),
                        0.0, 63.0).astype(jnp.int32)

    def _morton18(x, y, z):
        return (_mpart(_q6(x, 0)) | (_mpart(_q6(y, 1)) << 1)
                | (_mpart(_q6(z, 2)) << 2))

    def _dir_of(a, b, g):
        """Octant, optionally refined by the dominant axis (2 more
        bits above the 24-bit payload): tiles then share a ~45-deg
        cone instead of a 90-deg one."""
        o = _oct_of(a, b, g)
        if not wave_dir_sub:
            return o << 24
        aa, ab, ag = jnp.abs(a), jnp.abs(b), jnp.abs(g)
        dom = jnp.where((aa >= ab) & (aa >= ag), 0,
                        jnp.where(ab >= ag, 1, 2)).astype(jnp.int32)
        return (o << 26) | (dom << 24)

    def _regen_key(c, cdx, cdy, cdz):
        """Key for a regenerated camera lane: octant x 32x32 block."""
        bi = (jnp.floor(c["py"] * (1.0 / 32.0))
              * float(-(-W // 32))
              + jnp.floor(c["px"] * (1.0 / 32.0))).astype(jnp.int32)
        return _dir_of(cdx, cdy, cdz) | (1 << 22) \
            | jnp.minimum(bi, 0x3FFFFF)

    def _pack_key(alive, regen, k_al, k_re):
        key_i = (jnp.where(alive, k_al,
                           jnp.where(regen, k_re,
                                     jnp.int32(0x3F000000)))
                 | jnp.int32(0x40000000))
        if interpret:
            return jax.lax.bitcast_convert_type(key_i, jnp.float32)
        return pltpu.bitcast(key_i, jnp.float32)

    if wave_genesis:
        # ------------------------------------------------------------------
        # Genesis kernel: synthesize a FRESH wave entirely in-kernel —
        # the XLA init (camera math + sobol bits + key init over n_pad
        # lanes, ~25 elementwise passes on a runtime whose op floor is
        # ~3 GB/s) collapses to one VPU-rate pallas launch. Inputs are
        # the three per-lane constants (px, py, lane id — device
        # resident, uploaded once at build); everything else (sample
        # slot, per-lane want from sc[3]/sc[4], camera jitter + ray,
        # regen-convention sort key) is computed here exactly as the
        # wave kernel's regeneration path would (wave_bounce regen,
        # camera.rs:77-90 math).
        def _u32g(x_i32):
            if interpret:
                return jax.lax.bitcast_convert_type(x_i32, jnp.uint32)
            return pltpu.bitcast(x_i32, jnp.uint32)

        N_REAL_F = float(NPIX * max(wave_spw, 1))

        def genesis_kernel(sc_ref, px_ref, py_ref, lane_ref, sout):
            # sc: [seed, -1 (pre-launch depth), _, want//spw, want%spw]
            pid = pl.program_id(0)
            dep0 = sc_ref[1]
            if not interpret:
                pltpu.prng_seed(sc_ref[0] + pid * jnp.int32(65537)
                                + dep0 * jnp.int32(7919))
            pxf = px_ref[:, :]
            pyf = py_ref[:, :]
            lane_f = lane_ref[:, :]
            if interpret:
                lane_i = jax.lax.bitcast_convert_type(
                    lane_f.astype(jnp.int32), jnp.uint32)
                seed_u = jax.lax.bitcast_convert_type(
                    jnp.full(SHAPE, sc_ref[0] + (dep0 + jnp.int32(1))
                             * jnp.int32(7919), jnp.int32), jnp.uint32)
                st = (lane_i * jnp.uint32(2654435761) ^ seed_u) \
                    | jnp.uint32(1)
            else:
                st = jnp.uint32(1)  # pass-through on TPU
            # sample slot q = lane // npix (float div + fixup, exact for
            # lane < 2^23) and the per-lane want split base + `rem` ones
            npix_f = float(NPIX)
            q = jnp.floor(lane_f * (1.0 / npix_f))
            r = lane_f - q * npix_f
            q = q + jnp.where(r >= npix_f, 1.0, 0.0) \
                - jnp.where(r < 0.0, 1.0, 0.0)
            base_f = _i2f_small(_u32g(jnp.full(SHAPE, sc_ref[3],
                                               jnp.int32)))
            rem_f = _i2f_small(_u32g(jnp.full(SHAPE, sc_ref[4],
                                              jnp.int32)))
            real = lane_f < N_REAL_F
            want = jnp.where(
                real, base_f + jnp.where(q < rem_f, 1.0, 0.0), 0.0)
            alive = want > 0.0
            if SOBOL:
                wseed_u = _u32g(jnp.full(SHAPE, sc_ref[0], jnp.int32))
                pixkey = sob_pixkey(pxf, pyf, wseed_u)
                scum = q * base_f + jnp.minimum(q, rem_f)
                ju, jv = ld2(scum.astype(jnp.int32), pixkey,
                             (scum * 0.0).astype(jnp.int32), SLOT_CAM)
            else:
                ju, st = uniform(st)
                jv, st = uniform(st)
            cdx, cdy, cdz = camera_ray(pxf, pyf, ju, jv)
            zero = pxf * 0.0
            one = zero + 1.0
            alf = jnp.where(alive, one, zero)
            keyf = _pack_key(alive, alive & False,
                             _regen_key({"px": pxf, "py": pyf},
                                        cdx, cdy, cdz), jnp.int32(0))
            sout[WROW_O, :, :] = jnp.where(alive, zero + cam_ox,
                                           zero + DEAD_ORIGIN)
            sout[WROW_O + 1, :, :] = jnp.where(alive, zero + cam_oy,
                                               zero + DEAD_ORIGIN)
            sout[WROW_O + 2, :, :] = jnp.where(alive, zero + cam_oz,
                                               zero + DEAD_ORIGIN)
            sout[WROW_D, :, :] = cdx
            sout[WROW_D + 1, :, :] = cdy
            sout[WROW_D + 2, :, :] = cdz
            for _row in range(3):
                sout[WROW_C + _row, :, :] = one
                sout[WROW_R + _row, :, :] = zero
            sout[WROW_ALIVE, :, :] = alf
            sout[WROW_RAYS, :, :] = zero
            sout[WROW_LANE, :, :] = lane_f
            sout[WROW_PX, :, :] = pxf
            sout[WROW_PY, :, :] = pyf
            sout[WROW_SMP, :, :] = zero
            sout[WROW_DEP, :, :] = zero
            sout[WROW_WANT, :, :] = want
            sout[WROW_KEY, :, :] = keyf
            for _row in range(6):
                sout[WROW_AN + _row, :, :] = zero
            # med (vacuum) for volpath + dummy padding rows
            for _row in range(W_SORT_ROWS, W_SORT_PAD):
                sout[_row, :, :] = zero
            for _row in range(WROW_AA + 3, W_NROWS):
                sout[_row, :, :] = zero

        return genesis_kernel

    def wave_bounce(c, mref, iref, eref):
        dep = c["dep"]  # per-lane (float) bounce index
        was_alive = c["alive"] > 0.5
        cr, cg, cb = c["cr"], c["cg"], c["cb"]
        rays = c["rays"] + jnp.where(was_alive, 1.0, 0.0) \
            * (1.0 + len(ps.lights) + (1.0 if E > 0 else 0.0))

        t, attr, cid = trace_closest(c["ox"], c["oy"], c["oz"],
                                     c["dx"], c["dy"], c["dz"], TMIN,
                                     mref, want_cid=True)
        hit = t < BIG
        miss = was_alive & ~hit
        attr, bg = apply_images(iref, c, attr, hit, miss)
        rr_ = c["rr"] + jnp.where(miss, cr * bg[0], 0.0)
        rg_ = c["rg"] + jnp.where(miss, cg * bg[1], 0.0)
        rb_ = c["rb"] + jnp.where(miss, cb * bg[2], 0.0)
        alive = was_alive & hit

        hx = c["ox"] + t * c["dx"]
        hy = c["oy"] + t * c["dy"]
        hz = c["oz"] + t * c["dz"]
        nx, ny, nz = normalize3(attr["nx"], attr["ny"], attr["nz"])
        wox, woy, woz = -c["dx"], -c["dy"], -c["dz"]
        ux, uy, uz, vx, vy, vz = onb_from_w(nx, ny, nz)

        # emitter hit (one-sided)
        al_on = alive & ((attr["alr"] != 0.0) | (attr["alg"] != 0.0)
                         | (attr["alb"] != 0.0)) \
            & (dot3(wox, woy, woz, nx, ny, nz) > 0.0)
        rr_ = rr_ + jnp.where(al_on, cr * attr["alr"], 0.0)
        rg_ = rg_ + jnp.where(al_on, cg * attr["alg"], 0.0)
        rb_ = rb_ + jnp.where(al_on, cb * attr["alb"], 0.0)

        # AOVs at bounce 0 (of every sample)
        first = alive & (dep == 0.0)
        anx = c["anx"] + jnp.where(first, nx, 0.0)
        any_ = c["any"] + jnp.where(first, ny, 0.0)
        anz = c["anz"] + jnp.where(first, nz, 0.0)
        aar = c["aar"] + jnp.where(first, attr["abr"], 0.0)
        aag = c["aag"] + jnp.where(first, attr["abg"], 0.0)
        aab = c["aab"] + jnp.where(first, attr["abb"], 0.0)

        lox_, loy_, loz_ = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                    wox, woy, woz)

        # NEE for distant lights
        def _dist_body(carry, lt6, hx=hx, hy=hy, hz=hz, ux=ux, uy=uy,
                       uz=uz, vx=vx, vy=vy, vz=vz, nx=nx, ny=ny, nz=nz,
                       attr=attr, lox_=lox_, loy_=loy_, loz_=loz_,
                       alive=alive, cr=cr, cg=cg, cb=cb, mref=mref):
            rr_, rg_, rb_ = carry
            ldx, ldy, ldz, lcr, lcg, lcb = lt6
            zf = hx * 0.0
            bdx, bdy, bdz = zf + ldx, zf + ldy, zf + ldz
            shadowed = trace_any(hx, hy, hz, bdx, bdy, bdz,
                                 TMIN, 1e5, mref,
                                 dir_scalars=(ldx, ldy, ldz)
                                 if CONST_DIR else None)
            lwx, lwy, lwz = to_local(ux, uy, uz, vx, vy, vz,
                                     nx, ny, nz, bdx, bdy, bdz)
            fe_r, fe_g, fe_b, _ = bsdf_eval(attr, lox_, loy_, loz_,
                                            lwx, lwy, lwz)
            cosl = jnp.abs(ldx * nx + ldy * ny + ldz * nz)
            okl = alive & ~shadowed
            rr_ = rr_ + jnp.where(okl, cr * fe_r * cosl * lcr, 0.0)
            rg_ = rg_ + jnp.where(okl, cg * fe_g * cosl * lcg, 0.0)
            rb_ = rb_ + jnp.where(okl, cb * fe_b * cosl * lcb, 0.0)
            return rr_, rg_, rb_

        rr_, rg_, rb_ = fold_lights((rr_, rg_, rb_), _dist_body)

        # scatter (with emitter MIS, identical estimator to body())
        st = c["st"]
        if SOBOL:
            sidx = (c["scum"] + c["smp"]).astype(jnp.int32)
            dep_i = dep.astype(jnp.int32)
            u1, u2 = ld2(sidx, c["pixkey"], dep_i, SLOT_BSDF)
            u_coin, ul = ld2(sidx, c["pixkey"], dep_i, SLOT_COIN)
        else:
            u_coin, st = uniform(st)
            u1, st = uniform(st)
            u2, st = uniform(st)
            ul, st = uniform(st)
        swx, swy, swz, sfr, sfg, sfb, spdf = bsdf_sample(
            attr, lox_, loy_, loz_, u_coin, u1, u2, ul)
        swx, swy, swz = to_world(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                 swx, swy, swz)

        if E > 0 or HAS_ENV:
            if SOBOL:
                ue1, ue2 = ld2(sidx, c["pixkey"], dep_i, SLOT_NEE1)
                ue3, ue4 = ld2(sidx, c["pixkey"], dep_i, SLOT_NEE2)
                coin, upick = ld2(sidx, c["pixkey"], dep_i, SLOT_MISC)
            else:
                coin, st = uniform(st)
                ue1, st = uniform(st)
                ue2, st = uniform(st)
                ue3, st = uniform(st)
                ue4, st = uniform(st)
                if HAS_ENV and E > 0:
                    upick, st = uniform(st)
            if E > 0:
                ls_wx, ls_wy, ls_wz = sample_emit(hx, hy, hz, ue1, ue2,
                                                  ue3, ue4)
            if HAS_ENV:
                ex_, ey_, ez_ = env_strategy(eref, ue1, ue2, ue3, ue4)
                if E > 0:
                    tke = upick * float(E + 1) < 1.0
                    ls_wx = jnp.where(tke, ex_, ls_wx)
                    ls_wy = jnp.where(tke, ey_, ls_wy)
                    ls_wz = jnp.where(tke, ez_, ls_wz)
                else:
                    ls_wx, ls_wy, ls_wz = ex_, ey_, ez_
            take_light = (coin > 0.5) & is_diffuse(attr)
            wx_ = jnp.where(take_light, ls_wx, swx)
            wy_ = jnp.where(take_light, ls_wy, swy)
            wz_ = jnp.where(take_light, ls_wz, swz)
            llx, lly, llz = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                     ls_wx, ls_wy, ls_wz)
            fe_r, fe_g, fe_b, fe_pdf = bsdf_eval(attr, lox_, loy_, loz_,
                                                 llx, lly, llz)
            f_r = jnp.where(take_light, fe_r, sfr)
            f_g = jnp.where(take_light, fe_g, sfg)
            f_b = jnp.where(take_light, fe_b, sfb)
            pdf_b = jnp.where(take_light, fe_pdf, spdf)
            lp_ = trace_emit_pdf(hx, hy, hz, wx_, wy_, wz_) \
                if E > 0 else 0.0
            if HAS_ENV:
                lp_ = lp_ + env_pdf_dir(eref, wx_, wy_, wz_)
            lpdf = lp_ / float(E + (1 if HAS_ENV else 0))
            mis = is_diffuse(attr)
            pdf = jnp.where(mis, 0.5 * pdf_b + 0.5 * lpdf, spdf)
            f_r = jnp.where(mis, f_r, sfr)
            f_g = jnp.where(mis, f_g, sfg)
            f_b = jnp.where(mis, f_b, sfb)
            wx_ = jnp.where(mis, wx_, swx)
            wy_ = jnp.where(mis, wy_, swy)
            wz_ = jnp.where(mis, wz_, swz)
        else:
            wx_, wy_, wz_, f_r, f_g, f_b, pdf = (swx, swy, swz, sfr,
                                                 sfg, sfb, spdf)

        alive = alive & (pdf >= 1e-5)
        cosw = jnp.abs(wx_ * nx + wy_ * ny + wz_ * nz)
        scale = cosw / jnp.maximum(pdf, 1e-20)
        cr = cr * f_r * scale
        cg = cg * f_g * scale
        cb = cb * f_b * scale
        alive = alive & ((cr != 0.0) | (cg != 0.0) | (cb != 0.0))

        if use_rr:
            if SOBOL:
                rrv, _ = ld2(sidx, c["pixkey"], dep_i, SLOT_RR)
            else:
                rrv, st = uniform(st)
            p_cont = jnp.clip(jnp.maximum(cr, jnp.maximum(cg, cb)),
                              0.0, 1.0)
            do_rr = dep > RR_START
            alive = alive & (~do_rr | (rrv <= p_cont))
            inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)
            keep = do_rr & alive
            cr = jnp.where(keep, cr * inv_p, cr)
            cg = jnp.where(keep, cg * inv_p, cg)
            cb = jnp.where(keep, cb * inv_p, cb)

        alive = alive & (dep + 1.0 < MAXD)

        # regeneration (mega body semantics): a finished lane starts its
        # pixel's next sample; exhausted lanes park at DEAD_ORIGIN
        finished = was_alive & ~alive
        smp = c["smp"] + jnp.where(finished, 1.0, 0.0)
        regen = finished & (smp < c["want"])
        if SOBOL:
            cj1, cj2 = ld2((c["scum"] + smp).astype(jnp.int32),
                           c["pixkey"],
                           (c["smp"] * 0.0).astype(jnp.int32),
                           SLOT_CAM)
        else:
            cj1, st = uniform(st)
            cj2, st = uniform(st)
        cdx, cdy, cdz = camera_ray(c["px"], c["py"], cj1, cj2)
        park = finished & ~regen
        zero = c["alive"] * 0.0
        one = zero + 1.0

        # --- next-launch sort key (WROW_KEY), computed here at VPU
        # rate instead of ~20 XLA elementwise passes per sort on the
        # host (layout: see the shared helpers above)
        pay = jnp.where(cid >= 0, jnp.minimum(cid, 0x3FFFFF),
                        (1 << 23) | _morton18(hx, hy, hz))
        k_al = _dir_of(wx_, wy_, wz_) | pay
        keyf = _pack_key(alive, regen, k_al, _regen_key(c, cdx, cdy,
                                                        cdz))

        def pick3(a1, a2, b2c):
            return jnp.where(regen, a1, jnp.where(alive, a2, b2c))

        return {
            "ox": pick3(zero + cam_ox, hx,
                        jnp.where(park, DEAD_ORIGIN, c["ox"])),
            "oy": pick3(zero + cam_oy, hy,
                        jnp.where(park, DEAD_ORIGIN, c["oy"])),
            "oz": pick3(zero + cam_oz, hz,
                        jnp.where(park, DEAD_ORIGIN, c["oz"])),
            "dx": pick3(cdx, wx_, c["dx"]),
            "dy": pick3(cdy, wy_, c["dy"]),
            "dz": pick3(cdz, wz_, c["dz"]),
            "cr": pick3(one, cr, c["cr"]),
            "cg": pick3(one, cg, c["cg"]),
            "cb": pick3(one, cb, c["cb"]),
            "rr": rr_, "rg": rg_, "rb": rb_,
            "anx": anx, "any": any_, "anz": anz,
            "aar": aar, "aag": aag, "aab": aab,
            "alive": jnp.where(alive | regen, one, zero),
            "rays": rays,
            "px": c["px"], "py": c["py"], "want": c["want"],
            "smp": smp,
            "dep": jnp.where(regen, zero,
                             jnp.where(alive, dep + 1.0, dep)),
            "key": keyf,
            "st": st,
            **({"pixkey": c["pixkey"], "scum": c["scum"]}
               if SOBOL else {}),
        }

    def wave_bounce_vol(c, mref, iref, eref):
        """volpath wave bounce: body_vol's estimator (lib.rs:477-803 —
        medium distance sampling, phase NEE through tr marching,
        surface NEE with transmittance, None-material passthrough,
        medium-interface tracking, no RR) under the wave contract
        (want/smp regeneration, DEAD_ORIGIN parking, WROW_KEY)."""
        dep = c["dep"]
        was_alive = c["alive"] > 0.5
        cr, cg, cb = c["cr"], c["cg"], c["cb"]
        med = c["med"]
        rays = c["rays"] + jnp.where(was_alive, 1.0, 0.0) \
            * (1.0 + len(ps.lights) + (1.0 if E > 0 else 0.0))

        t, attr, cid = trace_closest(c["ox"], c["oy"], c["oz"],
                                     c["dx"], c["dy"], c["dz"], TMIN,
                                     mref, want_cid=True)
        hit = t < BIG
        miss = was_alive & ~hit
        attr, bg = apply_images(iref, c, attr, hit, miss)
        rr_ = c["rr"] + jnp.where(miss, cr * bg[0], 0.0)
        rg_ = c["rg"] + jnp.where(miss, cg * bg[1], 0.0)
        rb_ = c["rb"] + jnp.where(miss, cb * bg[2], 0.0)
        alive = was_alive & hit

        hx = c["ox"] + t * c["dx"]
        hy = c["oy"] + t * c["dy"]
        hz = c["oz"] + t * c["dz"]
        nx, ny, nz = normalize3(attr["nx"], attr["ny"], attr["nz"])
        wox, woy, woz = -c["dx"], -c["dy"], -c["dz"]
        ux, uy, uz, vx, vy, vz = onb_from_w(nx, ny, nz)
        mat_none = attr["mat"] == float(T.MAT_NONE)

        # -- medium sampling along the segment (lib.rs:561-565)
        st = c["st"]
        sampled, t_med, mw, st = med_sample(med, t, st)
        sampled = sampled & alive
        cr = jnp.where(alive, cr * mw[0], cr)
        cg = jnp.where(alive, cg * mw[1], cg)
        cb = jnp.where(alive, cb * mw[2], cb)
        mpx = c["ox"] + t_med * c["dx"]
        mpy = c["oy"] + t_med * c["dy"]
        mpz = c["oz"] + t_med * c["dz"]

        # ======== medium interaction ========
        def _med_dist(carry, lt6, mpx=mpx, mpy=mpy, mpz=mpz,
                      wox=wox, woy=woy, woz=woz, med=med,
                      sampled=sampled, cr=cr, cg=cg, cb=cb, mref=mref):
            rr_, rg_, rb_ = carry
            ldx, ldy, ldz, lcr, lcg, lcb = lt6
            zf = mpx * 0.0
            trv = tr_march(mpx, mpy, mpz, zf + ldx, zf + ldy,
                           zf + ldz, med, False, mref)
            cosw = wox * ldx + woy * ldy + woz * ldz
            phase = med_phase(med, cosw)
            rr_ = rr_ + jnp.where(sampled, cr * trv[0] * phase * lcr,
                                  0.0)
            rg_ = rg_ + jnp.where(sampled, cg * trv[1] * phase * lcg,
                                  0.0)
            rb_ = rb_ + jnp.where(sampled, cb * trv[2] * phase * lcb,
                                  0.0)
            return rr_, rg_, rb_

        rr_, rg_, rb_ = fold_lights((rr_, rg_, rb_), _med_dist)
        m_dx, m_dy, m_dz, st = med_sample_p(med, wox, woy, woz, st)
        if E > 0:
            ue1, st = uniform(st)
            ue2, st = uniform(st)
            ue3, st = uniform(st)
            ue4, st = uniform(st)
            ls_x, ls_y, ls_z = sample_emit(mpx, mpy, mpz,
                                           ue1, ue2, ue3, ue4)
            epdf = trace_emit_pdf(mpx, mpy, mpz,
                                  ls_x, ls_y, ls_z) / float(E)
            tr_e = tr_march(mpx, mpy, mpz, ls_x, ls_y, ls_z,
                            med, True, mref)
            cosw = wox * ls_x + woy * ls_y + woz * ls_z
            phase_e = med_phase(med, cosw) / jnp.maximum(epdf, 1e-5)
            ok_e = sampled & (epdf > 1e-5)
            rr_ = rr_ + jnp.where(ok_e, cr * tr_e[0] * phase_e, 0.0)
            rg_ = rg_ + jnp.where(ok_e, cg * tr_e[1] * phase_e, 0.0)
            rb_ = rb_ + jnp.where(ok_e, cb * tr_e[2] * phase_e, 0.0)

        # ======== surface interaction ========
        surf = alive & ~sampled
        al_on = surf & ((attr["alr"] != 0.0) | (attr["alg"] != 0.0)
                        | (attr["alb"] != 0.0)) \
            & (dot3(wox, woy, woz, nx, ny, nz) > 0.0)
        rr_ = rr_ + jnp.where(al_on, cr * attr["alr"], 0.0)
        rg_ = rg_ + jnp.where(al_on, cg * attr["alg"], 0.0)
        rb_ = rb_ + jnp.where(al_on, cb * attr["alb"], 0.0)

        first = surf & (dep == 0.0)
        anx = c["anx"] + jnp.where(first, nx, 0.0)
        any_ = c["any"] + jnp.where(first, ny, 0.0)
        anz = c["anz"] + jnp.where(first, nz, 0.0)
        aar = c["aar"] + jnp.where(first, attr["abr"], 0.0)
        aag = c["aag"] + jnp.where(first, attr["abg"], 0.0)
        aab = c["aab"] + jnp.where(first, attr["abb"], 0.0)

        lox_, loy_, loz_ = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                    wox, woy, woz)
        surf_scatter = surf & ~mat_none

        # surface NEE with transmittance
        def _surf_dist(carry, lt6, hx=hx, hy=hy, hz=hz, ux=ux, uy=uy,
                       uz=uz, vx=vx, vy=vy, vz=vz, nx=nx, ny=ny, nz=nz,
                       attr=attr, lox_=lox_, loy_=loy_, loz_=loz_,
                       med=med, surf_scatter=surf_scatter, cr=cr,
                       cg=cg, cb=cb, mref=mref):
            rr_, rg_, rb_ = carry
            ldx, ldy, ldz, lcr, lcg, lcb = lt6
            zf = hx * 0.0
            bdx, bdy, bdz = zf + ldx, zf + ldy, zf + ldz
            trv = tr_march(hx, hy, hz, bdx, bdy, bdz, med, False, mref)
            lwx, lwy, lwz = to_local(ux, uy, uz, vx, vy, vz,
                                     nx, ny, nz, bdx, bdy, bdz)
            fe_r, fe_g, fe_b, _ = bsdf_eval(attr, lox_, loy_, loz_,
                                            lwx, lwy, lwz)
            cosl = jnp.abs(ldx * nx + ldy * ny + ldz * nz)
            rr_ = rr_ + jnp.where(surf_scatter, cr * trv[0] * fe_r
                                  * cosl * lcr, 0.0)
            rg_ = rg_ + jnp.where(surf_scatter, cg * trv[1] * fe_g
                                  * cosl * lcg, 0.0)
            rb_ = rb_ + jnp.where(surf_scatter, cb * trv[2] * fe_b
                                  * cosl * lcb, 0.0)
            return rr_, rg_, rb_

        rr_, rg_, rb_ = fold_lights((rr_, rg_, rb_), _surf_dist)

        # scatter with emitter MIS (same estimator as wave_bounce)
        if SOBOL:
            sidx = (c["scum"] + c["smp"]).astype(jnp.int32)
            dep_i = dep.astype(jnp.int32)
            u1, u2 = ld2(sidx, c["pixkey"], dep_i, SLOT_BSDF)
            u_coin, ul = ld2(sidx, c["pixkey"], dep_i, SLOT_COIN)
        else:
            u_coin, st = uniform(st)
            u1, st = uniform(st)
            u2, st = uniform(st)
            ul, st = uniform(st)
        swx, swy, swz, sfr, sfg, sfb, spdf = bsdf_sample(
            attr, lox_, loy_, loz_, u_coin, u1, u2, ul)
        swx, swy, swz = to_world(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                 swx, swy, swz)
        if E > 0 or HAS_ENV:
            if SOBOL:
                ue1, ue2 = ld2(sidx, c["pixkey"], dep_i, SLOT_NEE1)
                ue3, ue4 = ld2(sidx, c["pixkey"], dep_i, SLOT_NEE2)
                coin, upick = ld2(sidx, c["pixkey"], dep_i, SLOT_MISC)
            else:
                coin, st = uniform(st)
                ue1, st = uniform(st)
                ue2, st = uniform(st)
                ue3, st = uniform(st)
                ue4, st = uniform(st)
                if HAS_ENV and E > 0:
                    upick, st = uniform(st)
            if E > 0:
                ls_wx, ls_wy, ls_wz = sample_emit(hx, hy, hz, ue1, ue2,
                                                  ue3, ue4)
            if HAS_ENV:
                ex_, ey_, ez_ = env_strategy(eref, ue1, ue2, ue3, ue4)
                if E > 0:
                    tke = upick * float(E + 1) < 1.0
                    ls_wx = jnp.where(tke, ex_, ls_wx)
                    ls_wy = jnp.where(tke, ey_, ls_wy)
                    ls_wz = jnp.where(tke, ez_, ls_wz)
                else:
                    ls_wx, ls_wy, ls_wz = ex_, ey_, ez_
            take_light = (coin > 0.5) & is_diffuse(attr)
            wx_ = jnp.where(take_light, ls_wx, swx)
            wy_ = jnp.where(take_light, ls_wy, swy)
            wz_ = jnp.where(take_light, ls_wz, swz)
            llx, lly, llz = to_local(ux, uy, uz, vx, vy, vz, nx, ny, nz,
                                     ls_wx, ls_wy, ls_wz)
            fe_r, fe_g, fe_b, fe_pdf = bsdf_eval(attr, lox_, loy_, loz_,
                                                 llx, lly, llz)
            f_r = jnp.where(take_light, fe_r, sfr)
            f_g = jnp.where(take_light, fe_g, sfg)
            f_b = jnp.where(take_light, fe_b, sfb)
            pdf_b = jnp.where(take_light, fe_pdf, spdf)
            lp_ = trace_emit_pdf(hx, hy, hz, wx_, wy_, wz_) \
                if E > 0 else 0.0
            if HAS_ENV:
                lp_ = lp_ + env_pdf_dir(eref, wx_, wy_, wz_)
            lpdf = lp_ / float(E + (1 if HAS_ENV else 0))
            mis = is_diffuse(attr)
            pdf = jnp.where(mis, 0.5 * pdf_b + 0.5 * lpdf, spdf)
            f_r = jnp.where(mis, f_r, sfr)
            f_g = jnp.where(mis, f_g, sfg)
            f_b = jnp.where(mis, f_b, sfb)
            wx_ = jnp.where(mis, wx_, swx)
            wy_ = jnp.where(mis, wy_, swy)
            wz_ = jnp.where(mis, wz_, swz)
        else:
            wx_, wy_, wz_, f_r, f_g, f_b, pdf = (swx, swy, swz, sfr,
                                                 sfg, sfb, spdf)

        cosw = jnp.abs(wx_ * nx + wy_ * ny + wz_ * nz)
        scale = cosw / jnp.maximum(pdf, 1e-20)
        sc_r = cr * f_r * scale
        sc_g = cg * f_g * scale
        sc_b = cb * f_b * scale

        # next ray per lane kind (medium scatter / surface / parked)
        new_ox = jnp.where(sampled, mpx, jnp.where(surf, hx, c["ox"]))
        new_oy = jnp.where(sampled, mpy, jnp.where(surf, hy, c["oy"]))
        new_oz = jnp.where(sampled, mpz, jnp.where(surf, hz, c["oz"]))
        new_dx = jnp.where(sampled, m_dx,
                           jnp.where(surf_scatter, wx_, c["dx"]))
        new_dy = jnp.where(sampled, m_dy,
                           jnp.where(surf_scatter, wy_, c["dy"]))
        new_dz = jnp.where(sampled, m_dz,
                           jnp.where(surf_scatter, wz_, c["dz"]))
        cr = jnp.where(surf_scatter, sc_r, cr)
        cg = jnp.where(surf_scatter, sc_g, cg)
        cb = jnp.where(surf_scatter, sc_b, cb)
        alive = alive & (sampled | (surf & (mat_none | (pdf >= 1e-5))))

        # medium interface crossing at surfaces (lib.rs:775-779)
        crossing_out = dot3(wox, woy, woz, nx, ny, nz) < 0.0
        new_med = jnp.where(
            surf, jnp.where(crossing_out, attr["emed"], attr["imed"]),
            med)

        alive = alive & ((cr != 0.0) | (cg != 0.0) | (cb != 0.0))
        alive = alive & (dep + 1.0 < MAXD)

        # regeneration (wave contract: finished lanes start their
        # pixel's next sample until `want`, then park)
        finished = was_alive & ~alive
        smp = c["smp"] + jnp.where(finished, 1.0, 0.0)
        regen = finished & (smp < c["want"])
        if SOBOL:
            cj1, cj2 = ld2((c["scum"] + smp).astype(jnp.int32),
                           c["pixkey"],
                           (c["smp"] * 0.0).astype(jnp.int32),
                           SLOT_CAM)
        else:
            cj1, st = uniform(st)
            cj2, st = uniform(st)
        cdx, cdy, cdz = camera_ray(c["px"], c["py"], cj1, cj2)
        park = finished & ~regen
        zero = c["alive"] * 0.0
        one = zero + 1.0

        # sort key: surface lanes bin by the winner cluster like the
        # path wave; medium-scattered lanes have no surface cluster —
        # bin them by the scatter point's Morton cell x new octant
        pay_s = jnp.where(cid >= 0, jnp.minimum(cid, 0x3FFFFF),
                          (1 << 23) | _morton18(hx, hy, hz))
        pay = jnp.where(sampled, (1 << 23) | _morton18(mpx, mpy, mpz),
                        pay_s)
        k_al = _dir_of(new_dx, new_dy, new_dz) | pay
        keyf = _pack_key(alive, regen, k_al, _regen_key(c, cdx, cdy,
                                                        cdz))

        def pick3(a1, a2, b2c):
            return jnp.where(regen, a1, jnp.where(alive, a2, b2c))

        return {
            "ox": pick3(zero + cam_ox, new_ox,
                        jnp.where(park, DEAD_ORIGIN, c["ox"])),
            "oy": pick3(zero + cam_oy, new_oy,
                        jnp.where(park, DEAD_ORIGIN, c["oy"])),
            "oz": pick3(zero + cam_oz, new_oz,
                        jnp.where(park, DEAD_ORIGIN, c["oz"])),
            "dx": pick3(cdx, new_dx, c["dx"]),
            "dy": pick3(cdy, new_dy, c["dy"]),
            "dz": pick3(cdz, new_dz, c["dz"]),
            "cr": pick3(one, cr, c["cr"]),
            "cg": pick3(one, cg, c["cg"]),
            "cb": pick3(one, cb, c["cb"]),
            "rr": rr_, "rg": rg_, "rb": rb_,
            "anx": anx, "any": any_, "anz": anz,
            "aar": aar, "aag": aag, "aab": aab,
            "alive": jnp.where(alive | regen, one, zero),
            "rays": rays,
            "px": c["px"], "py": c["py"], "want": c["want"],
            "smp": smp,
            "dep": jnp.where(regen, zero,
                             jnp.where(alive, dep + 1.0, dep)),
            "med": jnp.where(regen, zero,
                             jnp.where(alive, new_med, med)),
            "key": keyf,
            "st": st,
            **({"pixkey": c["pixkey"], "scum": c["scum"]}
               if SOBOL else {}),
        }

    def wave_kernel(sc_ref, *refs):
        # sc_ref: SMEM int32 [seed, launch_idx, n_alive_tiles]
        if NC and HBM_MESH:
            main = (refs[0], refs[1], refs[-2], refs[-1])
            refs = refs[2:-2]
        elif NC:
            main, refs = (refs[0], refs[1]), refs[2:]
        else:
            main = None
        inst_refs = []
        for _ in range(NINST):
            inst_refs.append((refs[0], refs[1], refs[2]))
            refs = refs[3:]
        mref = (main, inst_refs) if (NC or NINST) else None
        if HAS_IMG:
            iref, refs = refs[0], refs[1:]
        else:
            iref = None
        if HAS_ENV:
            eref, refs = refs[0], refs[1:]
        else:
            eref = None
        if N_SPH:
            _sref_hold.clear()
            _sref_hold.append(refs[0])
            refs = refs[1:]
        if LIGHT_TABLE:
            _lref_hold.clear()
            _lref_hold.append(refs[0])
            refs = refs[1:]
        sin, sout = refs
        pid = pl.program_id(0)
        dep0 = sc_ref[1]
        if not interpret:
            pltpu.prng_seed(sc_ref[0] + pid * jnp.int32(65537)
                            + dep0 * jnp.int32(7919))

        # interpret-mode RNG stream: lane-unique ids (row WROW_LANE)
        # hashed with (seed, depth); pass-through on TPU
        lane_f = sin[WROW_LANE, :, :]
        if interpret:
            lane_i = jax.lax.bitcast_convert_type(
                lane_f.astype(jnp.int32), jnp.uint32)
            seed_u = jax.lax.bitcast_convert_type(
                jnp.full(SHAPE, sc_ref[0] + (dep0 + jnp.int32(1))
                         * jnp.int32(7919), jnp.int32), jnp.uint32)
        else:
            lane_i = pltpu.bitcast(lane_f.astype(jnp.int32), jnp.uint32)
            seed_u = pltpu.bitcast(
                jnp.full(SHAPE, sc_ref[0] + (dep0 + jnp.int32(1))
                         * jnp.int32(7919), jnp.int32), jnp.uint32)
        st0 = (lane_i * jnp.uint32(2654435761) ^ seed_u) | jnp.uint32(1)

        c = {
            "ox": sin[WROW_O, :, :], "oy": sin[WROW_O + 1, :, :],
            "oz": sin[WROW_O + 2, :, :],
            "dx": sin[WROW_D, :, :], "dy": sin[WROW_D + 1, :, :],
            "dz": sin[WROW_D + 2, :, :],
            "cr": sin[WROW_C, :, :], "cg": sin[WROW_C + 1, :, :],
            "cb": sin[WROW_C + 2, :, :],
            "rr": sin[WROW_R, :, :], "rg": sin[WROW_R + 1, :, :],
            "rb": sin[WROW_R + 2, :, :],
            "anx": sin[WROW_AN, :, :], "any": sin[WROW_AN + 1, :, :],
            "anz": sin[WROW_AN + 2, :, :],
            "aar": sin[WROW_AA, :, :], "aag": sin[WROW_AA + 1, :, :],
            "aab": sin[WROW_AA + 2, :, :],
            "alive": sin[WROW_ALIVE, :, :],
            "rays": sin[WROW_RAYS, :, :],
            "px": sin[WROW_PX, :, :], "py": sin[WROW_PY, :, :],
            "smp": sin[WROW_SMP, :, :], "dep": sin[WROW_DEP, :, :],
            "want": sin[WROW_WANT, :, :],
            "key": sin[WROW_KEY, :, :],
            "st": st0,
        }
        if VOL:
            c["med"] = sin[WROW_MED, :, :]
        if SOBOL:
            # wave-constant seed (draws at a given depth happen in
            # DIFFERENT launches as lanes stagger, so the key must not
            # depend on the launch index), pixel key, and the lane's
            # slot-cumulative sample offset: pixel-global sample index
            # = scum + smp, with want_total split as base+`rem ones`
            # over the pixel's spw lanes (sc[3]=base, sc[4]=rem).
            wseed_u = _u32(jnp.full(SHAPE, sc_ref[0], jnp.int32))
            c["pixkey"] = sob_pixkey(c["px"], c["py"], wseed_u)
            base_f = _i2f_small(_u32(jnp.full(SHAPE, sc_ref[3],
                                              jnp.int32)))
            rem_f = _i2f_small(_u32(jnp.full(SHAPE, sc_ref[4],
                                             jnp.int32)))
            npix_f = float(W * H)
            q = jnp.floor(lane_f * (1.0 / npix_f))
            r = lane_f - q * npix_f
            q = q + jnp.where(r >= npix_f, 1.0, 0.0) \
                - jnp.where(r < 0.0, 1.0, 0.0)
            c["scum"] = q * base_f + jnp.minimum(q, rem_f)

        def chunk(cc):
            for _ in range(wave_k):
                cc = (wave_bounce_vol if VOL else wave_bounce)(
                    cc, mref, iref, eref)
            return cc

        # tiles past the alive prefix (rays sorted dead-last) are a copy
        c = jax.lax.cond(pid < sc_ref[2], chunk, lambda cc: cc, c)
        sout[WROW_O, :, :] = c["ox"]
        sout[WROW_O + 1, :, :] = c["oy"]
        sout[WROW_O + 2, :, :] = c["oz"]
        sout[WROW_D, :, :] = c["dx"]
        sout[WROW_D + 1, :, :] = c["dy"]
        sout[WROW_D + 2, :, :] = c["dz"]
        sout[WROW_C, :, :] = c["cr"]
        sout[WROW_C + 1, :, :] = c["cg"]
        sout[WROW_C + 2, :, :] = c["cb"]
        sout[WROW_R, :, :] = c["rr"]
        sout[WROW_R + 1, :, :] = c["rg"]
        sout[WROW_R + 2, :, :] = c["rb"]
        sout[WROW_AN, :, :] = c["anx"]
        sout[WROW_AN + 1, :, :] = c["any"]
        sout[WROW_AN + 2, :, :] = c["anz"]
        sout[WROW_AA, :, :] = c["aar"]
        sout[WROW_AA + 1, :, :] = c["aag"]
        sout[WROW_AA + 2, :, :] = c["aab"]
        sout[WROW_ALIVE, :, :] = c["alive"]
        sout[WROW_RAYS, :, :] = c["rays"]
        sout[WROW_LANE, :, :] = lane_f
        sout[WROW_PX, :, :] = c["px"]
        sout[WROW_PY, :, :] = c["py"]
        sout[WROW_SMP, :, :] = c["smp"]
        sout[WROW_DEP, :, :] = c["dep"]
        sout[WROW_WANT, :, :] = c["want"]
        sout[WROW_KEY, :, :] = c["key"]
        if VOL:
            sout[WROW_MED, :, :] = c["med"]
        # dummy padding rows (DMA-permutation alignment): keep them
        # written so the output block is fully defined
        for _row in range(W_SORT_ROWS + (1 if VOL else 0), W_SORT_PAD):
            sout[_row, :, :] = lane_f * 0.0
        for _row in range(WROW_AA + 3, W_NROWS):
            sout[_row, :, :] = lane_f * 0.0

    return wave_kernel



def _mesh_operands(ps: PallasScene):
    """(in_specs, args, scratch_shapes) for the scene's cluster/image
    operands, in the order both kernels unpack them: main table (VMEM or
    HBM+box), then per-shared-blas (geom, box, instance-rows) triples,
    then the image atlas; the HBM DMA scratch+semaphore trail."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    specs, args, scratch = [], [], []
    if ps.n_clusters and ps.mesh_hbm:
        # geometry stays in HBM; the compact box table is VMEM-resident
        # and gates per-group DMAs into the scratch buffer
        specs += [pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(ps.mesh_box.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        args += [jnp.asarray(ps.mesh_geom), jnp.asarray(ps.mesh_box)]
        scratch = [pltpu.VMEM((ps.mesh_geom.shape[0], SUPER * CLUSTER),
                              jnp.float32),
                   pltpu.SemaphoreType.DMA]
    elif ps.n_clusters:
        # one resident VMEM table + box table shared by every grid step
        # (constant block index -> fetched once, not per tile)
        specs += [pl.BlockSpec(ps.mesh_geom.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(ps.mesh_box.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        args += [jnp.asarray(ps.mesh_geom), jnp.asarray(ps.mesh_box)]
    for im in (ps.inst_meshes or []):
        for arr in (im["geom"], im["box"], im["inst_rows"]):
            specs.append(pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            args.append(jnp.asarray(arr))
    if ps.img_table is not None:
        specs.append(pl.BlockSpec(ps.img_table.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(jnp.asarray(ps.img_table))
    if ps.env_tab is not None:
        specs.append(pl.BlockSpec(ps.env_tab.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(jnp.asarray(ps.env_tab))
    if ps.n_sph_blocks:
        specs.append(pl.BlockSpec(ps.sph_table.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(jnp.asarray(ps.sph_table))
    if ps.light_table is not None:
        specs.append(pl.BlockSpec(ps.light_table.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(jnp.asarray(ps.light_table))
    return specs, args, scratch


def packed_sub_tris(ntri: int) -> int:
    """Packed megakernels default to SUB_TRIS=16 (the r4g/r4j sweep
    winner at packed beam tightness), but the finer split doubles the
    octant box table (4 rows/super-group at n_sub=8 vs 2 at n_sub=4):
    past ~900 super-groups the 8-section table alone exceeds the
    scoped-VMEM budget (r4q2 A2: 1.047M tris at ST=16 -> a 16.76 MB
    table, Mosaic OOM at the 16 MB limit). Fall back to 32 there —
    8.4 MB keeps octant-ordered marching, which is worth more than the
    finer split on meshes that large."""
    n_clusters = -(-max(ntri, 1) // CLUSTER)
    n_super = -(-n_clusters // SUPER)
    g_rows, _ = _box_layout(CLUSTER // 16)
    if 8 * n_super * g_rows * 128 * 4 <= OCT_TABLE_MAX_BYTES:
        return 16
    return 32


def floor_call_secs(npix: int, ntri: int, max_depth: int = 5,
                    volpath: bool = False) -> float:
    """Modeled seconds of ONE minimum-size kernel call (pack=1,
    chunk=1) — the irreducible runtime-watchdog exposure. auto_pack's
    units model at pack=1 over the measured worst-case unit rate
    (~4.2e12 units/s, calibrated on the r4h/r4q points)."""
    mult = (4 if ntri >= HBM_MIN_TRIS else 1) * (4 if volpath else 1)
    return (npix * max(ntri, 1) * min(max(max_depth, 1), 64) * mult
            / 4.2e12)


def auto_pack(npix: int, ntri: int, max_depth: int = 5,
              volpath: bool = False) -> int:
    """Auto sample-in-tile pack: the largest pack in (64, 16, 4) whose
    lane count fits the memory budget (1<<26 lanes; 12 f32 lane
    buffers ~ 3.2 GB) AND whose single packed call stays under the
    runtime watchdog (~1 min kills the TPU worker). A packed call
    delivers `pack` spp in ONE kernel launch — it cannot be chunked
    below that — so the pack choice is the only watchdog control.

    Per-call cost model: units = npix*pack * ntri * maxdepth, x4 for
    the HBM-streamed march (DMA per entered group), x4 for volpath
    (tr marching re-traces per NEE sample); cap 1.7e14 units (~40 s
    worst-case). Conservatively calibrated on every measured point:
    dragon 51k tris md17 @720p pack=64 = 5 s/call (r4h, kept);
    teapot 126k md64 @720p pack=16 = 19.3 s (r4h H4, kept; 64 would
    blow the cap); 262k-tri HBM sphere md5 @720p pack=16 = 17.6 s and
    523k pack=16 = 23.9 s (r4q Q1/Q2, kept) while 262k @720p pack=64
    CRASHED the worker (r4q Q3 — the bug this cap fixes); fog-teapot
    volpath @320x180 pack=64 = ~7 s (r4i, kept)."""
    md = min(max(max_depth, 1), 64)
    mult = (4 if ntri >= HBM_MIN_TRIS else 1) * (4 if volpath else 1)
    for p in (64, 16, 4):
        units = npix * p * max(ntri, 1) * md * mult
        if npix * p <= (1 << 26) and units <= 1.7e14:
            return p
    return 1


def make_pallas_batch_fn(buffers_np, config: RenderConfig,
                         interpret: bool = False,
                         pad_tiles_to: int = 1,
                         pack: int = 0):
    """Returns run(seed: int32 scalar, num_samples static) -> dict of (N,3)
    radiance/normal/albedo + rays, or None if the scene is ineligible.

    `pack` (cluster scenes only; 1, 4 or 16; 0 = env `RENE_MEGA_PACK`
    else 1): sample-in-tile packing. A tile's 1024 lanes cover a
    (32/sqrt(pack))^2-pixel block x pack sample slots instead of a
    32x32-pixel block, so the tile's camera beam is sqrt(pack)x tighter
    and the any-lane cluster cull admits far fewer boxes on big meshes
    (r4g proxy sweep: dragon @720p 0.108 -> 0.090/0.083 predicted at
    pack=4/16). num_samples then counts PER-LANE samples: one call
    delivers num_samples*pack samples per pixel (exposed as
    run.spp_mult; lane sums over slots are reduced in finish()).
    This is the TPU stand-in for raising occupancy per RT-core dispatch
    (reference: rene/src/main.rs:2417-2908 ray scheduling).

    `pad_tiles_to`: round the tile count up to a multiple (so the ray-tile
    grid divides a device mesh; see parallel.shard.make_pallas_multichip).
    The returned callable also exposes the multichip building blocks:
    `.call_tiles(seed, num_samples, px, py)` (traceable, per-tile-block
    pallas call), `.finish(outs)` (lane -> pixel gather), `.px_host` /
    `.py_host`, `.tile_sub`, `.n_tiles`.
    """
    if not pallas_eligible(buffers_np, config):
        return None
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    npix = config.film.xresolution * config.film.yresolution
    if pack == 0:
        envp = os.environ.get("RENE_MEGA_PACK", "")
        if envp and envp != "auto":
            pack = int(envp)
        elif interpret and not envp:
            # tests/CPU: packing multiplies the interpret-mode tile
            # count for no cull win the interpreter would notice
            pack = 1
        else:
            # auto: lane budget AND per-call watchdog model (see
            # auto_pack — r4h/r4j: dragon @720p 0.108 unpacked ->
            # 0.0791 at pack=64; r4q Q3: 262k tris @720p pack=64
            # crashed the worker, capped to 16 now)
            if config.integrator == "volpath":
                from .volpath import max_depth_for as _mdf
            else:
                from .path import max_depth_for as _mdf
            pack = auto_pack(npix, config.num_triangles, _mdf(config),
                             config.integrator == "volpath")
    if pack not in (1, 4, 16, 64, 256):
        raise ValueError(f"pack must be a power of 4 <= 256, got {pack}")
    # packed marches prefer finer sub-blocks (ST=16 beat 32/64 at every
    # packed proxy/real point — except where its box table blows VMEM,
    # see packed_sub_tris); a non-default module SUB_TRIS (sessions
    # set pp.SUB_TRIS directly) or RENE_SUB_TRIS wins. The table packer
    # below and the kernel builder (call_tiles) must use the SAME split.
    sub_tris = int(os.environ.get("RENE_SUB_TRIS", "0")) or \
        (SUB_TRIS if SUB_TRIS != 64 else
         (packed_sub_tris(config.num_triangles) if pack > 1 else 0))
    # set/restore the module knob around the packer (same pattern the
    # wave runner and sessions use; `global` can't be declared after
    # the reads above)
    _g = globals()
    _st0 = _g["SUB_TRIS"]
    _g["SUB_TRIS"] = sub_tris or _st0
    try:
        ps = pack_scene(buffers_np, config)
    finally:
        _g["SUB_TRIS"] = _st0
    cluster_mode = bool(ps.n_clusters or ps.inst_meshes)
    tile_sub = MESH_TILE_SUB if cluster_mode else TILE_SUB
    tile = tile_sub * 128
    if not cluster_mode:
        pack = 1  # immediates scenes do no box culling — nothing to win
    sel_idx = None
    if cluster_mode:
        # cluster scenes: one tile = a square 32x32 pixel block (with
        # packing: a smaller block x pack sample slots), so the tile's
        # camera-ray beam stays tight and the any-lane AABB cull skips
        # most clusters (a 1024-pixel scan-line strip crosses far more
        # boxes than a square block)
        bs = 32 // int(np.sqrt(pack))
        ppb = bs * bs              # pixels per block (tile = ppb * pack)
        bw = (ps.width + bs - 1) // bs
        bh = (ps.height + bs - 1) // bs
        n_tiles = bw * bh
        n_tiles = -(-n_tiles // pad_tiles_to) * pad_tiles_to
        rows = n_tiles * tile_sub
        t_idx = np.arange(n_tiles)[:, None]
        j = np.arange(tile)[None, :]
        jp = j % ppb               # pixel-in-block (slot = j // ppb,
        #                            rederived in-kernel from lane iota)
        # padding tiles (t_idx >= bw*bh) clamp to the last pixel rows
        pxi = np.minimum((t_idx % bw) * bs + jp % bs, ps.width - 1)
        pyi = np.minimum(np.minimum(t_idx // bw, bh - 1) * bs + jp // bs,
                         ps.height - 1)
        pix = (pyi * ps.width + pxi).reshape(-1)
        if pack == 1:
            # first lane owning each pixel (edge/padding blocks duplicate
            # clamped pixels; the output gather reads one representative
            # lane)
            inv_idx = np.zeros(npix, np.int64)
            inv_idx[pix[::-1]] = np.arange(pix.size - 1, -1, -1)
        else:
            # a tile's pack slots share the pixel-in-block layout, so
            # finish() sums lanes over the SLOT axis by reshape (a
            # sequential reduce — lane outputs are per-sample SUMS, so
            # the reduction is the film accumulation) and gathers ONE
            # representative (tile, pixel-in-block) position per pixel
            # (an npix gather instead of npix*pack)
            inv_idx = None
            flat = pix.reshape(n_tiles, tile)[:, :ppb].reshape(-1)
            sel_idx = np.zeros(npix, np.int64)
            sel_idx[flat[::-1]] = np.arange(flat.size - 1, -1, -1)
        px_host = pix.astype(np.float32).reshape(rows, 128) % ps.width
        py_host = (pix // ps.width).astype(np.float32).reshape(rows, 128)
    else:
        n_tiles = (npix + tile - 1) // tile
        n_tiles = -(-n_tiles // pad_tiles_to) * pad_tiles_to
        rows = n_tiles * tile_sub
        lanes = np.arange(rows * 128, dtype=np.int64)
        pix = np.minimum(lanes, npix - 1)
        inv_idx = None
        px_host = (pix % ps.width).astype(np.float32).reshape(rows, 128)
        py_host = (pix // ps.width).astype(np.float32).reshape(rows, 128)

    mesh_specs, mesh_args, scratch_shapes = _mesh_operands(ps)

    def call_tiles(seed, num_samples, px, py):
        """Traceable pallas call over a (rows_local, 128) lane block —
        the unit a shard_map shards; returns the 10 raw lane outputs.
        num_samples counts PER-LANE samples (x pack per pixel)."""
        kernel = _build_kernel(ps, num_samples, interpret, pack=pack,
                               sub_tris=sub_tris)
        rows_l = px.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(rows_l // tile_sub,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + mesh_specs
            + [pl.BlockSpec((tile_sub, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)] * 2,
            out_specs=tuple(
                [pl.BlockSpec((tile_sub, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 10),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((rows_l, 128), jnp.float32)] * 10),
            scratch_shapes=tuple(scratch_shapes),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32).astype(jnp.int32), *mesh_args,
          px, py)

    def finish(outs):
        """Full-rows lane outputs -> per-pixel dict."""
        if sel_idx is not None:
            sel2 = jnp.asarray(sel_idx)
            def to_pix(o):
                return o.reshape(n_tiles, pack, -1).sum(axis=1) \
                        .reshape(-1)[sel2]
        elif inv_idx is not None:
            sel = jnp.asarray(inv_idx)
            def to_pix(o):
                return o.reshape(-1)[sel]
        else:
            def to_pix(o):
                return o.reshape(-1)[:npix]
        rad = jnp.stack([to_pix(o) for o in outs[0:3]], axis=-1)
        nrm = jnp.stack([to_pix(o) for o in outs[3:6]], axis=-1)
        alb = jnp.stack([to_pix(o) for o in outs[6:9]], axis=-1)
        return {"radiance": rad, "normal": nrm, "albedo": alb,
                "rays": jnp.sum(outs[9])}

    # px/py live as device arrays OUTSIDE the jit: as closure constants
    # they'd be baked into the module (2 x rows x 128 x f32 — at packed
    # or proxy resolutions that exceeds the remote-compile body limit,
    # r4g G6 HTTP 413) and re-shipped on every compile
    px_dev = []

    @functools.partial(jax.jit, static_argnums=(1,))
    def _run(seed, num_samples, px, py):
        return finish(call_tiles(seed, num_samples, px, py))

    def _args():
        if not px_dev:
            px_dev.append((jnp.asarray(px_host), jnp.asarray(py_host)))
        return px_dev[0]

    def run(seed, num_samples):
        return _run(seed, num_samples, *_args())

    # warm-cache entry point (render.warm_cache): forward to the jit
    run.lower = lambda seed, num_samples: _run.lower(
        seed, num_samples, *_args())

    # samples per device call: the runtime watchdog kills executions that
    # run for minutes, and cluster-march cost scales with tiles x clusters
    # (~2e6 tile-cluster-samples ~= 30 s on one v5e chip, measured on
    # teapot/dragon). Immediates scenes are orders of magnitude faster.
    if cluster_mode:
        eff_clusters = ps.n_clusters + sum(
            im["n_clusters"] * im["n_inst"]
            for im in (ps.inst_meshes or []))
        # per-call device time ~ n_tiles * clusters * num_samples; with
        # packing n_tiles grows by pack, so the per-lane hint shrinks
        # while the DELIVERED samples per call (hint * pack) hold steady
        hint = max(1, min(100, 2_000_000
                          // max(n_tiles * eff_clusters, 1)))
        if ps.integrator == "volpath":
            # tr/tr_emit marching re-traces the mesh per NEE sample
            hint = max(1, hint // 4)
        run.chunk_hint = hint
        # irreducible-floor watchdog check: at pack=1 & chunk=1 a call
        # still costs ~npix*ntri*md units; past the auto_pack cost
        # model's margin NO knob can shrink it further — warn instead
        # of crashing the worker silently (auto-envelope test asserts
        # every auto pack>1 choice stays inside the margin and pins
        # floor_call_secs directly)
        floor_s = floor_call_secs(npix, config.num_triangles,
                                  ps.max_depth,
                                  ps.integrator == "volpath")
        if pack == 1 and floor_s > 40.0:
            log.warning(
                "scene shape (%d px, %d tris, depth %d%s) models "
                "~%.0f s/call at the minimum chunk — the runtime "
                "watchdog (~60 s) may kill the worker; consider a "
                "smaller film or lower maxdepth",
                npix, config.num_triangles, ps.max_depth,
                ", volpath" if ps.integrator == "volpath" else "",
                floor_s)
    else:
        run.chunk_hint = 100
    run.spp_mult = pack  # delivered spp per call = num_samples * pack
    run.call_tiles = call_tiles
    run.finish = finish
    run.px_host = px_host
    run.py_host = py_host
    run.tile_sub = tile_sub
    run.n_tiles = n_tiles
    run.npix = npix
    return run
