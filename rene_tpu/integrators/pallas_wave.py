"""Wavefront pallas engine: cross-tile ray redistribution.

The megakernel cluster march (pallas_path.py) pays the SIMT wall on
big-mesh scenes: after the first diffuse bounce a tile's 1024 lanes point
everywhere, any lane entering a cluster AABB forces the 64-triangle MT
unroll for the whole tile, and profiling (round 2, _PROFILE_SKIP_MT)
showed teapot@720p spends ~100% of its time in those entered unrolls.
Within-tile mitigations were measured and rejected; the fix is
CROSS-TILE: re-bin rays between bounces so each tile re-enters the march
with a coherent beam. This is the TPU replacement for the ray-reordering
the reference gets from RT-core hardware scheduling
(rene/src/main.rs:2417-2908).

Design:
* The whole in-flight wave (npix x samples_per_wave rays, one sample per
  lane, no regeneration) lives in ONE (W_NROWS, N) f32 HBM array
  (layout: pallas_path.WROW_*).
* A k-bounce Pallas kernel (_build_kernel(..., wave_k=k)) advances every
  alive lane; lanes die in place (origin parked at DEAD_ORIGIN so dead
  lanes never enter an AABB).
* Between launches, XLA computes a bin key = direction-octant (3 bits,
  major) x origin Morton cell (6 bits/axis), argsorts it (stable, so
  coherent runs survive), and gathers the state — one sort + one gather
  per step, O(instructions)-cheap on this runtime.
* Dead lanes sort to the end; a tile count of ceil(alive/1024) is passed
  in SMEM and trailing tiles skip the march entirely (copy-through).
* Film: each lane carries its pixel id (side array, permuted alongside);
  at wave end one argsort by pixel groups each pixel's samples_per_wave
  lanes for a segment sum — no scatter-add (TPU scatter is serial).

The estimator is identical to the megakernel body: NEE + 50/50 emitter
MIS + RR@12, reference semantics from rene-shader/src/lib.rs:141-357.
"""
from __future__ import annotations

import functools
import math
import os

import numpy as np

from ..scene.device import RenderConfig
from . import pallas_path as pp


def wave_supported(buffers_np, config: RenderConfig) -> bool:
    """Wave engine handles the pallas-eligible `path` AND `volpath`
    scenes (volpath waves carry one extra state row, the lane's medium
    index, and run the volpath bounce body — wave_bounce_vol)."""
    return (config.integrator in ("path", "volpath")
            and pp.pallas_eligible(buffers_np, config))


def auto_spw(npix: int, interpret: bool = False,
             spp_hint: int = 0) -> int:
    """Auto samples-per-wave (lanes per pixel): the 3<<23 lane budget
    (104 B/lane, ~2.8 GB of state + sort buffers), capped at 96 — the
    measured knee of the small-film amortization curve (r4p/r4p2
    @320x180: spw 24/48/96/192/384 -> 0.043/0.037/0.035/0.033/0.032
    s/spp teapot, 0.056/0.046/0.042/0.041 fog volpath; @720p the
    BUDGET binds: 8/12/16/18/24 -> 0.551/0.502/0.463/0.460/0.453,
    r4i/r4l). Interpret mode (CPU tests) keeps the old cap 24 so tiny
    test films don't pay 4x the lane count. `spp_hint` (the render's
    requested spp) clamps the result so a low-spp render never pays a
    wave bigger than the job (the runner delivers whole waves)."""
    cap = 24 if interpret else 96
    hint = max(2, spp_hint) if spp_hint > 0 else cap
    return max(2, min(cap, (3 << 23) // npix, hint))


def make_pallas_wave_fn(buffers_np, config: RenderConfig,
                        interpret: bool = False,
                        k_bounces: int = 0,
                        k_schedule=None,
                        samples_per_wave: int = 0,
                        sort_rays: bool = True,
                        sort_from: int = 1,
                        sort_first: int = 0,
                        oct_major: bool = True,
                        dir_bits: int = 3,
                        sub_tris: int = 32,
                        check_every: int = 1,
                        key_mode: str = "xla",
                        dir_sub: bool = False,
                        sort_gran: int = 0,
                        init_mode: str = "",
                        sort_mode: str = "",
                        sub_gate=None, spp_hint: int = 0,
                        mesh=None, axis: str = "spp"):
    """Build the wavefront runner; returns run(seed, num_samples) with the
    same contract as make_pallas_batch_fn (radiance/normal/albedo sums
    over num_samples + ray count), or None if unsupported.

    `k_schedule`: bounces per launch, per step (last entry repeats) —
    e.g. (1, 1, 1, 2, 4): sort each of the first three bounces on its
    own, then widen chunks as the wave thins. Defaults to the measured
    round-4 best (1, 1, 1, 2, 4) (teapot @720p 0.585 vs 0.613 s/spp for
    the round-3 (1, 1, 2, 4); VALIDATION round-4 D5).
    One Mosaic kernel per DISTINCT k. `dir_bits`: 3 = direction octant,
    6 = 2 bits/axis (finer beams, coarser 6-bit origin cells).
    `key_mode`: "xla" (default) computes the octant x bbox-Morton-cell
    key host-side (oct_major/dir_bits apply only there); "kernel" sorts
    the WROW_KEY row the kernel computed at bounce time — octant x
    winner-CLUSTER origin bins, surface-adaptive and free of XLA key
    math. Measured on-chip (r4a E1/E2, r4d D0): kernel keys LOSE ~4%
    both under morton and median clustering — the XLA key passes were
    already overlapped with device execution, and cluster-id bins buy
    no march win; xla is the default on the numbers.
    `sort_gran`: redistribution granularity in lanes. 1 (default) is
    the full per-lane stable argsort+gather. 128 is the COARSE bucket
    redistribution (VERDICT round-3 item 2): each 128-lane slice is a
    unit keyed by its min lane key (dead sentinel is the max key, so
    any alive lane's key wins), the argsort runs over n/128 slice keys
    and the gather moves contiguous 512-byte blocks — O(n/128) sort
    work instead of O(n log^2 n) comparator stages on the ~3 GB/s XLA
    op floor, at the cost of never splitting a slice whose lanes
    diverged (slices start coherent: 32x32 camera blocks, and stay
    coherent-ish because every sorted step groups by key). 0 (the
    signature default) reads RENE_WAVE_GRAN (default 1) so the driver
    surface can A/B the redistribution granularity without code
    changes.

    `init_mode`: "xla" (default) builds the fresh wave host-side (~25
    elementwise passes over n_pad lanes on the ~3 GB/s op-floor
    runtime); "kernel" runs the in-kernel GENESIS pass instead (one
    pallas launch; pallas_path wave_genesis). "" reads RENE_WAVE_INIT.

    `sort_mode`: "gather" (default) redistributes with jnp.take on the
    ~3 GB/s XLA op floor (granularity per `sort_gran`). "dma" is the
    second structurally distinct redistribution design (VERDICT round-3
    item 2): slice keys (min over each 128-lane slice of WROW_KEY) +
    a tiny ns-element argsort, then a Pallas kernel moves the whole
    population at HBM rate — G outstanding async copies per grid chunk,
    each a (W_SORT_PAD, 128) HBM->VMEM slice at a dynamic 128-aligned
    lane offset (the one legal DMA-gather shape; CLAUDE.md landmines).
    AOV rows pass through unpermuted (requires slim sorts,
    sort_from >= 1). Always full-population: the argsort is off the
    critical path, so prefix bucketing only bounds the MARCH tiles.
    "" reads RENE_WAVE_SORT.

    num_samples per call is capped at run.chunk_hint (= samples carried
    by one wave); the render driver already chunks to that. `spp_hint`
    (the render's requested spp) clamps the AUTO spw so a low-spp
    render never allocates/pays a wave bigger than the job; an explicit
    samples_per_wave bypasses it."""
    if not wave_supported(buffers_np, config):
        return None
    sort_gran = sort_gran or int(os.environ.get("RENE_WAVE_GRAN", "1"))
    init_mode = init_mode or os.environ.get("RENE_WAVE_INIT", "xla")
    sort_mode = sort_mode or os.environ.get("RENE_WAVE_SORT", "gather")
    if sub_gate is None:
        # per-sub-block MT gating (pallas_path SUB_GATE) defaults ON for
        # the wave engine ONLY: its sorted tiles enter members with few
        # live sub-boxes, so the cond overhead pays (r4f T1 0.554 vs TB
        # 0.582 s/spp teapot @720p); the megakernel's wide bounce beams
        # enter most sub-boxes and the same gating LOSES there (r4f F1a
        # dragon 0.126 vs FB 0.108).
        sub_gate = os.environ.get("RENE_WAVE_SUB_GATE", "1") == "1"
    if sort_mode == "dma" and sort_from < 1:
        sort_mode = "gather"  # dma passes AOVs through unpermuted,
        # which is only correct under slim-sort conditions
    if sort_mode == "dma":
        sort_gran = 128  # alive counts / prefix bounds are per-slice
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the wave's coherent entries favor finer MT sub-blocks than the
    # megakernel (SUB_TRIS=32: 1.142 vs 1.255 s/spp teapot @720p; the
    # mega measured 64 best). Packing and kernel builds happen inside
    # the override window (eager builds below).
    _sub0 = pp.SUB_TRIS
    pp.SUB_TRIS = sub_tris
    try:
        ps = pp.pack_scene(buffers_np, config)
    finally:
        pp.SUB_TRIS = _sub0
    W, H = ps.width, ps.height
    npix = W * H
    maxd = ps.max_depth
    tile_sub = pp.MESH_TILE_SUB
    tile = tile_sub * 128
    VOL = config.integrator == "volpath"
    NR = pp.W_NROWS_VOL if VOL else pp.W_NROWS

    # spw lanes per pixel; each lane streams its share of the wave's
    # samples back-to-back (mega-kernel regeneration). Measured optimum
    # (VALIDATION round 3) is one sample per lane per wave — small films
    # amortize sort+launch overheads over many lanes, large films over
    # at least 2 — so the driver chunk equals spw (want=1/lane);
    # explicit samples_per_wave still composes lanes x regeneration.
    # measured @720p: spw 1/2/4/8 -> 2.66/1.45/1.25/1.02 s/spp (r3) and
    # 8/12/16/18/24 -> 0.551/0.502/0.463/0.460/0.453 under the full r4
    # stack (r4i/r4l: the ~1.5 s/wave fixed init+finish cost amortizes
    # over spw; the curve flattens past 16) — budget 3<<23 lanes
    # (104 B/lane, ~2.8 GB of state at the budget + sort buffers).
    # Small films keep amortizing far past the old cap 24 (r4p/r4p2
    # @320x180: spw 24/48/96/192/384 -> 0.043/0.037/0.035/0.033/0.032
    # s/spp teapot, 0.056/0.046/0.042/0.041 fog volpath — the knee is
    # ~96), so the cap is 96 on hardware; interpret-mode (CPU tests)
    # keeps 24 so tiny test films don't pay 4x the lane count. The
    # render driver passes the requested spp as `spp_hint` so a
    # low-spp render never pays a full oversized wave (the runner
    # delivers whole waves; overshoot < spw).
    spw = samples_per_wave or auto_spw(npix, interpret, spp_hint)
    cap = spw
    n_real = npix * spw
    n_tiles = -(-n_real // tile)
    n_pad = n_tiles * tile

    # scene bounds for the origin Morton cells (10% margin)
    ntri = config.num_triangles
    pts = buffers_np["tri_p"][:ntri].reshape(-1, 3).astype(np.float64)
    if pts.size == 0:
        lo = np.zeros(3)
        hi = np.ones(3)
    else:
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
    for s in range(config.num_spheres):
        m = buffers_np["sph_o2w"][s].astype(np.float64)
        r = pp._sphere_radius(m.tolist())
        c = m[:3, 3]
        lo = np.minimum(lo, c - r)
        hi = np.maximum(hi, c + r)
    ext = np.maximum(hi - lo, 1e-9)
    lo = lo - 0.05 * ext
    ext = ext * 1.1

    # measured-best default schedule: sort each of the first three
    # bounces on its own, widen chunks as the wave thins (round-4 D5:
    # 0.585 vs 0.613 s/spp teapot @720p under median clustering)
    schedule = (tuple(k_schedule) if k_schedule
                else ((k_bounces,) if k_bounces else (1, 1, 1, 2, 4)))
    wave_bounds = (tuple(float(v) for v in lo),
                   tuple(float(v) for v in ext))
    _kernels = {}
    _genesis = None
    pp.SUB_TRIS = sub_tris
    try:
        for _k in set(schedule):
            _kernels[_k] = pp._build_kernel(ps, 0, interpret, wave_k=_k,
                                            wave_spw=spw,
                                            wave_bounds=wave_bounds,
                                            wave_dir_sub=dir_sub,
                                            sub_gate=sub_gate)
        if init_mode == "kernel":
            _genesis = pp._build_kernel(ps, 0, interpret, wave_k=1,
                                        wave_spw=spw,
                                        wave_bounds=wave_bounds,
                                        wave_dir_sub=dir_sub,
                                        wave_genesis=True,
                                        sub_gate=sub_gate)
    finally:
        pp.SUB_TRIS = _sub0
    mesh_specs, mesh_args, scratch_shapes = pp._mesh_operands(ps)
    state_spec = pl.BlockSpec((NR, tile_sub, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    def _kernel_for(k):
        if k not in _kernels:
            _kernels[k] = pp._build_kernel(ps, 0, interpret, wave_k=k,
                                           wave_spw=spw,
                                           wave_bounds=wave_bounds,
                                           wave_dir_sub=dir_sub,
                                           sub_gate=sub_gate)
        return _kernels[k]

    def call_kernel(k, sc, state3):
        return pl.pallas_call(
            _kernel_for(k),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + mesh_specs
            + [state_spec],
            out_specs=state_spec,
            out_shape=jax.ShapeDtypeStruct((NR, n_tiles * tile_sub, 128),
                                           jnp.float32),
            scratch_shapes=tuple(scratch_shapes),
            interpret=interpret,
        )(sc, *mesh_args, state3)

    def _morton_part(v):
        """Spread 10 low bits of an int32 to every 3rd bit."""
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def bin_key(state):
        """key_mode="kernel": the sort key IS the WROW_KEY row — the
        kernel wrote octant x winner-cluster-id (bit 30 set, so every
        key is a positive normal f32 ordered like its int bits; dead
        lanes carry 0x7F000000 = 1.7e38 and sort last). Zero host ops
        beyond the argsort itself.

        key_mode="xla": direction octant x 8-bit/axis origin Morton
        cell (27 bits; octant major by default — `oct_major=False`
        swaps to cell-major). Either way the sort is stable, so
        within-bucket order keeps the previous (spatially coherent)
        arrangement."""
        if key_mode == "kernel":
            return state[pp.WROW_KEY]
        ox, oy, oz = state[pp.WROW_O], state[pp.WROW_O + 1], \
            state[pp.WROW_O + 2]
        dx, dy, dz = state[pp.WROW_D], state[pp.WROW_D + 1], \
            state[pp.WROW_D + 2]
        alive = state[pp.WROW_ALIVE] > 0.5

        def q(v, axis):
            return jnp.clip((v - lo[axis]) / ext[axis] * 256.0,
                            0.0, 255.0).astype(jnp.int32)

        if dir_bits == 6:
            # 2 bits/axis direction cells, 6-bit/axis origin cells

            def qd(v):
                return jnp.clip((v + 1.0) * 2.0, 0.0, 3.0) \
                    .astype(jnp.int32)

            dirk = (qd(dx) << 4) | (qd(dy) << 2) | qd(dz)
            morton = ((_morton_part(q(ox, 0) >> 2)
                       | (_morton_part(q(oy, 1) >> 2) << 1)
                       | (_morton_part(q(oz, 2) >> 2) << 2)))
            key = ((dirk << 18) | morton) if oct_major \
                else ((morton << 6) | dirk)
        else:
            morton = (_morton_part(q(ox, 0))
                      | (_morton_part(q(oy, 1)) << 1)
                      | (_morton_part(q(oz, 2)) << 2))
            oct_ = ((dx < 0).astype(jnp.int32) * 4
                    + (dy < 0).astype(jnp.int32) * 2
                    + (dz < 0).astype(jnp.int32))
            key = ((oct_ << 24) | morton) if oct_major \
                else ((morton << 3) | oct_)
        return jnp.where(alive, key, jnp.int32(0x7FFFFFFF))

    # "slim" sorts permute only rows [0, SR): the AOV rows are written
    # exclusively at each sample's bounce 0 — all inside step 0 when
    # the wave carries one sample per lane (always true: want is capped
    # at spw) — so they stay in INITIAL lane order and the finish reads
    # them through a static permutation. Only valid when step 0 runs on
    # the initial order (sort_from >= 1). volpath includes the med row
    # (WROW_MED = W_SORT_ROWS: per-lane ray state, directly adjacent).
    slim = sort_rays and sort_from >= 1
    SR = (pp.WROW_MED + 1 if VOL else pp.W_SORT_ROWS) if slim else NR

    # ---- DMA slice-permutation (sort_mode="dma") ---------------------
    # out[:, j*128:(j+1)*128] = state[:W_SORT_PAD, perm[j]*128:...] via
    # G outstanding async copies per grid chunk; AOV rows stream
    # through unpermuted on the regular block pipeline.
    NS_ALL = n_pad // 128
    SPAD = pp.W_SORT_PAD
    if sort_mode == "dma":
        # Mosaic's block rule applies to the SMEM perm spec too: the
        # lane dim of a (1, DMA_G) block over the (1, NS_ALL) perm must
        # be 128-divisible or equal NS_ALL (on-chip r4b D1 failure —
        # G=64 lowered fine on tiny test shapes where the block WAS the
        # full array, then died at production NS_ALL=57600).
        DMA_G = 128 if NS_ALL % 128 == 0 else NS_ALL
        N_CHUNK = NS_ALL // DMA_G
        # fallback shape knob: copy ALL NR rows per slice (the
        # landmine-exact full-row-range DMA pattern; the AOV
        # passthrough then overwrites rows [SPAD, NR)) in case Mosaic
        # rejects the 24-of-32 row subrange src — +NR/SPAD DMA traffic
        DMA_FULL = os.environ.get("RENE_WAVE_DMA_FULL") == "1"
        CROWS = NR if DMA_FULL else SPAD

        def _dma_perm_kernel(perm_ref, state_ref, aov_ref, out_ref,
                             sem):
            cps = []
            for g in range(DMA_G):
                src = perm_ref[0, g]
                cp = pltpu.make_async_copy(
                    state_ref.at[0:CROWS, pl.ds(src * 128, 128)],
                    out_ref.at[0:CROWS, g * 128:(g + 1) * 128],
                    sem.at[g])
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()
            out_ref[SPAD:, :] = aov_ref[:, :]

        def _dma_permute(state, perm2):
            return pl.pallas_call(
                _dma_perm_kernel,
                grid=(N_CHUNK,),
                in_specs=[
                    pl.BlockSpec((1, DMA_G), lambda i: (0, i),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((NR - SPAD, DMA_G * 128),
                                 lambda i: (SPAD // (NR - SPAD), i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((NR, DMA_G * 128),
                                       lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NR, n_pad),
                                               jnp.float32),
                scratch_shapes=[pltpu.SemaphoreType.DMA((DMA_G,))],
                interpret=interpret,
            )(perm2, state, state)

    def _sort_prefix_core(state, pix, m):
        """Sort the first m lanes (a host-chosen power-of-4 bucket that
        bounds the alive prefix — alive lanes always sit in a prefix
        after any sorted step, dead-last). Sorting a 57k-lane prefix
        costs ~8 ms where the full 1M-lane sort costs ~85 on this
        runtime; the write-back is an in-place dynamic_update_slice on
        the donated buffer.

        sort_gran > 1: permute whole slices instead of lanes — the
        slice key is the MIN lane key (dead sentinel sorts fully-dead
        slices last), the argsort shrinks by gran x, and the gather
        moves contiguous blocks.

        sort_mode="dma": full-population slice permutation through the
        Pallas DMA kernel (HBM rate, not the XLA op floor); m only
        bounds the march tiles upstream. Lanes never leave their
        128-lane slice, so `pix` carries the COMPOSED slice permutation
        (cum: current slice j holds initial slice cum[j]) instead of
        per-lane pixel ids — composition is an ns-element take, and the
        finish UNDOES the total permutation with one more DMA pass
        instead of a full-population argsort(pix)."""
        if sort_mode == "dma":
            skey = jnp.min(state[pp.WROW_KEY].reshape(NS_ALL, 128),
                           axis=1)
            perm = jnp.argsort(skey).astype(jnp.int32)
            state = _dma_permute(state, perm.reshape(1, NS_ALL))
            return state, jnp.take(pix, perm)
        sub = state[:SR, :m]
        if sort_gran > 1:
            g = sort_gran
            ns = m // g
            skey = bin_key(sub).reshape(ns, g).min(axis=1)
            perm = jnp.argsort(skey)
            sub = jnp.take(sub.reshape(SR, ns, g), perm,
                           axis=1).reshape(SR, m)
            pix_sub = jnp.take(pix[:m].reshape(ns, g), perm,
                               axis=0).reshape(m)
        else:
            perm = jnp.argsort(bin_key(sub))
            sub = jnp.take(sub, perm, axis=1)
            pix_sub = jnp.take(pix[:m], perm)
        state = jax.lax.dynamic_update_slice(state, sub, (0, 0))
        pix = jax.lax.dynamic_update_slice(pix, pix_sub, (0,))
        return state, pix

    sort_prefix = functools.partial(jax.jit, static_argnums=(2,),
                                    donate_argnums=(0, 1))(
        _sort_prefix_core)

    def _bucket(n_lanes):
        """Smallest power-of-4 tile bucket covering n_lanes lanes."""
        m = tile * 4
        while m < min(n_lanes, n_pad):
            m *= 4
        return min(m, n_pad)

    def _kernel_step_core(k, state, seed, launch, nt, want_tot):
        # sc[3]/sc[4]: want_tot split as base + `rem` ones over a
        # pixel's spw lanes (the sobol sampler's pixel-global index)
        wt = want_tot.astype(jnp.int32)
        sc = jnp.stack([seed.astype(jnp.int32),
                        launch.astype(jnp.int32),
                        nt.astype(jnp.int32),
                        wt // spw, wt % spw])
        out = call_kernel(k, sc,
                          state.reshape(NR, n_tiles * tile_sub, 128))
        out = out.reshape(NR, n_pad)
        alive = out[pp.WROW_ALIVE] > 0.5
        if sort_gran > 1:
            # slice-granularity sorts only compact whole slices: the
            # prefix bound is (alive slices) x gran lanes. Still 0 iff
            # no lane is alive, so the early-exit check is unchanged.
            n_alive = (jnp.sum(jnp.any(
                alive.reshape(-1, sort_gran), axis=1))
                * sort_gran).astype(jnp.int32)
        else:
            n_alive = jnp.sum(alive).astype(jnp.int32)
        return out, n_alive

    def _make_kernel_step(k):
        @jax.jit
        def kernel_step(state, seed, launch, nt, want_tot):
            return _kernel_step_core(k, state, seed, launch, nt,
                                     want_tot)
        return kernel_step

    _steps = {}

    def kernel_step(k, state, seed, launch, nt, want_tot):
        if k not in _steps:
            _steps[k] = _make_kernel_step(k)
        return _steps[k](state, seed, launch, nt, want_tot)

    # camera init (camera.rs:77-90 math, vectorized in XLA)
    PI_ = ps.cam_proj_inv
    CW = ps.cam_to_world
    cam_o = np.array([CW[0, 3], CW[1, 3], CW[2, 3]], np.float32)
    # initial lane order: 32x32 pixel blocks (a scan-line strip's beam
    # crosses far more AABBs — same reason the megakernel tiles square
    # blocks), samples outermost so each tile holds one sample's block
    bs = 32
    ys, xs = np.mgrid[0:H, 0:W]
    blk = (ys // bs) * (-(-W // bs)) + (xs // bs)
    order = np.argsort(
        (blk * bs * bs + (ys % bs) * bs + (xs % bs)).reshape(-1),
        kind="stable").astype(np.int64)
    pix_host = np.concatenate([
        np.tile(order, spw),
        npix + np.arange(n_pad - n_real, dtype=np.int64)]).astype(np.int32)
    pxf_host = (np.minimum(pix_host, npix - 1) % W).astype(np.float32)
    pyf_host = (np.minimum(pix_host, npix - 1) // W).astype(np.float32)
    lane_host = np.arange(n_pad, dtype=np.int64).astype(np.float32)

    # sample-slot id per lane (lane l belongs to slot l // npix): the
    # wave's num_samples split across a pixel's spw lanes
    slot_host = np.minimum(np.arange(n_pad, dtype=np.int64) // npix,
                           spw - 1).astype(np.int32)
    real_host = (np.arange(n_pad) < n_real)

    def _init_state_core(seed, want_total, pxf, pyf, sloti, reali,
                         lanei, pixi):
        """Fresh wave: camera rays for every lane with a nonzero sample
        target; want_total samples split as evenly as integers allow
        across each pixel's spw lanes. The six per-lane index/coord
        arrays arrive as ARGUMENTS (device-resident, uploaded once): as
        jit closure constants they are baked into the serialized module
        and blow the remote-compile body limit at spw >= 16 @720p
        (n_pad ~ 15M lanes; same failure class as r4g G6)."""
        key = jax.random.fold_in(jax.random.PRNGKey(0),
                                 seed.astype(jnp.uint32))
        ju, jv = jax.random.uniform(key, (2, n_pad), jnp.float32)
        if ps.sampler == "sobol":
            # first camera draw of each lane's first sample — the same
            # (index, key) scheme as the in-kernel regen draws
            # (pallas_path SLOT_CAM with depth 0)
            from ..ops import sobol as _sob
            base = seed.astype(jnp.int32) * 0 + want_total // spw
            rem = want_total % spw
            scum = sloti * base + jnp.minimum(sloti, rem)
            sidx = scum.astype(jnp.uint32) & jnp.uint32(0xFFFF)
            seed_u = seed.astype(jnp.uint32)
            pid_u = jnp.minimum(pixi, npix - 1).astype(jnp.uint32)
            pixkey = _sob.hash_u32(
                pid_u ^ (seed_u * jnp.uint32(0x85EBCA6B)))
            ub, vb = _sob.ld2_bits(sidx, pixkey)
            ju = ub.astype(jnp.float32) * (1.0 / 2**32)
            jv = vb.astype(jnp.float32) * (1.0 / 2**32)
        from .camera import filter_jitter
        ju = filter_jitter(ju, float(ps.filter_radius))
        jv = filter_jitter(jv, float(ps.filter_radius))
        u = (pxf + ju) * (1.0 / max(W - 1, 1))
        v = (pyf + jv) * (1.0 / max(H - 1, 1))
        nx_ = u * 2.0 - 1.0
        ny_ = v * 2.0 - 1.0
        tcx = PI_[0, 0] * nx_ + PI_[0, 1] * ny_ + PI_[0, 2] + PI_[0, 3]
        tcy = PI_[1, 0] * nx_ + PI_[1, 1] * ny_ + PI_[1, 2] + PI_[1, 3]
        tcz = PI_[2, 0] * nx_ + PI_[2, 1] * ny_ + PI_[2, 2] + PI_[2, 3]
        twx = CW[0, 0] * tcx + CW[0, 1] * tcy + CW[0, 2] * tcz + CW[0, 3]
        twy = CW[1, 0] * tcx + CW[1, 1] * tcy + CW[1, 2] * tcz + CW[1, 3]
        twz = CW[2, 0] * tcx + CW[2, 1] * tcy + CW[2, 2] * tcz + CW[2, 3]
        dx = twx - cam_o[0]
        dy = twy - cam_o[1]
        dz = twz - cam_o[2]
        inv = 1.0 / jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz,
                                         1e-20))
        want_lane = jnp.where(
            reali,
            want_total // spw + (sloti < want_total % spw), 0) \
            .astype(jnp.float32)
        alive = (want_lane > 0).astype(jnp.float32)
        zeros = jnp.zeros((n_pad,), jnp.float32)
        # WROW_KEY init mirrors the kernel's regen key (camera lanes:
        # octant | 1<<22 | 32x32 pixel block); dead pad lanes get the
        # sentinel so they sort last even before the first launch
        dxn, dyn, dzn = dx * inv, dy * inv, dz * inv
        oct_i = (jnp.where(dxn < 0, 4, 0) + jnp.where(dyn < 0, 2, 0)
                 + jnp.where(dzn < 0, 1, 0)).astype(jnp.int32)
        bi = (jnp.floor(pyf * (1.0 / 32.0)) * float(-(-W // 32))
              + jnp.floor(pxf * (1.0 / 32.0))).astype(jnp.int32)
        key_i = (jnp.where(alive > 0.5,
                           (oct_i << 24) | (1 << 22) | bi,
                           jnp.int32(0x3F000000))
                 | jnp.int32(0x40000000))
        key_row = jax.lax.bitcast_convert_type(key_i, jnp.float32)
        state = jnp.stack([
            jnp.where(alive > 0.5, cam_o[0], pp.DEAD_ORIGIN),
            jnp.where(alive > 0.5, cam_o[1], pp.DEAD_ORIGIN),
            jnp.where(alive > 0.5, cam_o[2], pp.DEAD_ORIGIN),
            dx * inv, dy * inv, dz * inv,
            zeros + 1.0, zeros + 1.0, zeros + 1.0,   # throughput
            zeros, zeros, zeros,                      # radiance
            alive, zeros,                             # alive, rays
            lanei,
            pxf, pyf,                                 # owned pixel
            zeros, zeros,                             # sample, depth
            want_lane,                                # per-lane target
            key_row,                                  # sort key
            zeros, zeros, zeros,   # med (volpath: vacuum) + dummy
                                   # padding up to W_SORT_PAD
            zeros, zeros, zeros, zeros, zeros, zeros,  # AOVs (never
                                                       # permuted)
            zeros, zeros,          # tail padding to W_NROWS (8-row
        ])                         # aligned DMA AOV passthrough)
        if sort_mode == "dma":
            return state, jnp.arange(NS_ALL, dtype=jnp.int32)
        # non-donated jit input -> the returned pix is a fresh buffer
        # (the sorts donate it)
        return state, pixi

    if init_mode == "kernel":
        # in-kernel genesis: the per-lane coordinates stream in as
        # three tiled f32 inputs (device-resident args — as closure
        # constants they hit the remote-compile body limit at large
        # spw, like the xla-mode arrays above); everything else is
        # synthesized at VPU rate (wave_genesis in pallas_path.py).
        # The pix side array is donated to the sorts, so each wave
        # needs a fresh buffer.
        _px2 = pxf_host.reshape(n_tiles * tile_sub, 128)
        _py2 = pyf_host.reshape(n_tiles * tile_sub, 128)
        _ln2 = lane_host.reshape(n_tiles * tile_sub, 128)
        _const_spec = pl.BlockSpec((tile_sub, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)

        def _genesis_call(sc, px2, py2, ln2):
            return pl.pallas_call(
                _genesis, grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          _const_spec, _const_spec, _const_spec],
                out_specs=state_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (NR, n_tiles * tile_sub, 128), jnp.float32),
                interpret=interpret,
            )(sc, px2, py2, ln2)

        def _init_state_core(seed, want_total, px2, py2,  # noqa: F811
                             ln2, pixi):
            wt = want_total.astype(jnp.int32)
            sc = jnp.stack([seed.astype(jnp.int32), jnp.int32(-1),
                            jnp.int32(0), wt // spw, wt % spw])
            state = _genesis_call(sc, px2, py2, ln2).reshape(NR, n_pad)
            if sort_mode == "dma":
                return state, jnp.arange(NS_ALL, dtype=jnp.int32)
            # non-donated jit input -> fresh buffer for the sorts
            return state, pixi

    # per-lane device constants, uploaded lazily once and passed as
    # jit ARGS (see _init_state_core's docstring)
    _N_IC = 4 if init_mode == "kernel" else 6
    _dev_ic = []

    def _init_consts():
        if not _dev_ic:
            if init_mode == "kernel":
                _dev_ic.append((jnp.asarray(_px2), jnp.asarray(_py2),
                                jnp.asarray(_ln2),
                                jnp.asarray(pix_host)))
            else:
                _dev_ic.append((jnp.asarray(pxf_host),
                                jnp.asarray(pyf_host),
                                jnp.asarray(slot_host),
                                jnp.asarray(real_host),
                                jnp.asarray(lane_host),
                                jnp.asarray(pix_host)))
        return _dev_ic[0]

    _jit_init = jax.jit(_init_state_core)

    def init_state(seed, want_total):
        return _jit_init(seed, want_total, *_init_consts())
    # 2-arg adapter for the Mosaic lowering export test (the tiny test
    # scene can afford baked constants)
    init_state.__wrapped__ = lambda seed, want_total: \
        _init_state_core(seed, want_total, *_init_consts())

    # static pixel grouping for the never-permuted AOV rows (slim mode)
    aov_perm_host = np.argsort(pix_host, kind="stable").astype(np.int32)
    # dma mode: rank r of the initial order owns pixel order[r]; after
    # the restore pass the per-rank sums map to the film through the
    # static inverse
    inv_order_host = np.argsort(order).astype(np.int32)

    def _finish_core(state, pix, aperm):
        """`aperm` (the static AOV pixel grouping, n_pad i32) is an
        ARGUMENT for the same remote-compile-size reason as the init
        constants; the dma branch ignores it (its inv_order is npix-
        sized — cheap to bake)."""
        if sort_mode == "dma":
            # `pix` is the composed slice permutation: one more DMA
            # pass restores the INITIAL lane order, making the pixel
            # grouping fully static — no full-population argsort
            inv = jnp.argsort(pix).astype(jnp.int32)
            state = _dma_permute(state, inv.reshape(1, NS_ALL))
            rows = state[pp.WROW_R:pp.WROW_R + 3, :n_real] \
                .reshape(3, spw, npix).sum(axis=1)
            arows = state[pp.WROW_AN:pp.WROW_AN + 6, :n_real] \
                .reshape(6, spw, npix).sum(axis=1)
            sums = jnp.take(jnp.concatenate([rows, arows], axis=0),
                            jnp.asarray(inv_order_host), axis=1)
            return sums, jnp.sum(state[pp.WROW_RAYS])
        order_d = jnp.argsort(pix)
        rows = jnp.take(state[pp.WROW_R:pp.WROW_R + 3], order_d,
                        axis=1)
        aorder = aperm if slim else order_d
        arows = jnp.take(state[pp.WROW_AN:pp.WROW_AN + 6], aorder,
                         axis=1)
        # each pixel's spw lanes are consecutive after the pixel sort
        sums = jnp.concatenate([
            rows[:, :n_real].reshape(3, npix, spw).sum(axis=2),
            arows[:, :n_real].reshape(6, npix, spw).sum(axis=2)],
            axis=0)
        return sums, jnp.sum(state[pp.WROW_RAYS])

    _dev_ap = []

    def _aperm():
        if not _dev_ap:
            _dev_ap.append(jnp.asarray(aov_perm_host))
        return _dev_ap[0]

    _jit_finish = jax.jit(_finish_core)

    def finish_wave(state, pix):
        return _jit_finish(state, pix, _aperm())
    finish_wave.__wrapped__ = _finish_core

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _accum_sums(prev_s, prev_r, s, r):
        return prev_s + s, prev_r + r

    if mesh is not None:
        # ---- multichip sample-DP: every device runs an independent
        # wave with a decorrelated seed; films psum over ICI at finish.
        # State carries a leading device axis (ndev, NR, n_pad); the
        # early-exit alive count is the psum'd total (a safe upper
        # bound for every device's tile prefix).
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        ndev = mesh.devices.size
        P3 = P(axis, None, None)
        P2 = P(axis, None)

        @jax.jit
        def _mc_init(seed, want_total, *consts):
            def per_dev(seed, want_total, *consts):
                idx = jax.lax.axis_index(axis).astype(jnp.int32)
                s, p = _init_state_core(seed + idx * jnp.int32(1000003),
                                        want_total, *consts)
                return s[None], p[None]
            f = shard_map(per_dev, mesh=mesh,
                          in_specs=(P(), P()) + (P(),) * _N_IC,
                          out_specs=(P3, P2), check_vma=False)
            return f(jnp.int32(seed), jnp.int32(want_total), *consts)

        def init_state(seed, want_total):  # noqa: F811
            return _mc_init(seed, want_total, *_init_consts())

        @functools.partial(jax.jit, static_argnums=(2,),
                           donate_argnums=(0, 1))
        def sort_prefix(state, pix, m):
            def per_dev(state, pix):
                s, p = _sort_prefix_core(state[0], pix[0], m)
                return s[None], p[None]
            f = shard_map(per_dev, mesh=mesh, in_specs=(P3, P2),
                          out_specs=(P3, P2), check_vma=False)
            return f(state, pix)

        def _make_kernel_step(k):
            @jax.jit
            def kernel_step(state, seed, launch, nt, want_tot):
                def per_dev(state, seed, launch, nt, want_tot):
                    idx = jax.lax.axis_index(axis).astype(jnp.int32)
                    out, n_alive = _kernel_step_core(
                        k, state[0], seed + idx * jnp.int32(1000003),
                        launch, nt, want_tot)
                    return out[None], jax.lax.psum(n_alive, axis)
                f = shard_map(per_dev, mesh=mesh,
                              in_specs=(P3, P(), P(), P(), P()),
                              out_specs=(P3, P()), check_vma=False)
                return f(state, seed, launch, nt, want_tot)
            return kernel_step

        @jax.jit
        def _mc_finish(state, pix, aperm):
            def per_dev(state, pix, aperm):
                sums, rays = _finish_core(state[0], pix[0], aperm)
                return (jax.lax.psum(sums, axis),
                        jax.lax.psum(rays, axis))
            f = shard_map(per_dev, mesh=mesh, in_specs=(P3, P2, P()),
                          out_specs=(P(), P()), check_vma=False)
            return f(state, pix, aperm)

        def finish_wave(state, pix):  # noqa: F811
            return _mc_finish(state, pix, _aperm())

    # launch count implied by the schedule
    steps = 0
    _dep = 0
    while _dep < maxd:
        _dep += schedule[min(steps, len(schedule) - 1)]
        steps += 1

    def run_dev(seed, num_samples, accum=None):
        """One wave of min(num_samples, spw) samples; returns DEVICE
        (sums, rays) — optionally accumulated into a previous wave's
        `accum` pair on-chip (donated), so a multi-wave render reads the
        film back ONCE instead of per wave (the development tunnel
        charges ~0.3-0.6 s per (9, npix) readback at 720p)."""
        import time as _time

        import jax.numpy as jnp
        # read per call, not at build time: sessions toggle profiling
        # on an already-built runner
        profile = os.environ.get("RENE_WAVE_PROFILE") == "1"
        want = min(int(num_samples), cap)
        state, pix = init_state(jnp.int32(seed), jnp.int32(want))
        # `prefix` = lane count bounding where alive rays can sit: the
        # initial real-lane block, shrunk by each sorted step (sorting
        # compacts alive lanes dead-last within the sorted bucket);
        # unsorted steps kill lanes IN PLACE so the bound is unchanged.
        # `last_alive` is a stale-high alive count from the last sync.
        prefix = n_real
        last_alive = n_real
        # regeneration keeps lanes busy until each finishes its sample
        # share; bound launches for the worst case (no early death)
        per_lane = -(-want // spw)
        max_launches = -(-maxd * per_lane // min(schedule)) + 8
        si = 0
        pending = None  # alive-count handle of the PREVIOUS step
        while si < max_launches:
            k = schedule[min(si, len(schedule) - 1)]
            do_sort = (sort_rays and si >= sort_from
                       and (sort_first <= 0
                            or si < sort_from + sort_first))
            t0 = _time.time() if profile else 0.0
            if do_sort:
                # dma sorts are always full-population: pin the static
                # bucket arg so every wave step shares ONE compile
                m = n_pad if sort_mode == "dma" else _bucket(prefix)
                state, pix = sort_prefix(state, pix, m)
                nt = min(-(-last_alive // tile), m // tile)
                prefix = nt * tile
            else:
                # alive lanes never leave the prefix without a sort
                nt = -(-prefix // tile)
            state, n_alive = kernel_step(k, state, jnp.int32(seed),
                                         jnp.int32(si), jnp.int32(nt),
                                         jnp.int32(want))
            si += 1
            if profile:
                last_alive = int(n_alive)
                print(f"    step {si - 1} (k {k}, sort={int(do_sort)}, "
                      f"nt={nt}): {(_time.time() - t0) * 1000:.0f} ms, "
                      f"alive {last_alive}", flush=True)
                if last_alive == 0:
                    break
                continue
            # pipelined early-exit: read the PREVIOUS step's count while
            # this step executes on-device — the host<->device roundtrip
            # per sync otherwise serializes every launch. Alive counts
            # are monotone nonincreasing (regeneration keeps lanes
            # alive, never resurrects), so the one-step-stale bound
            # stays a safe upper bound for the sort prefix; at worst one
            # extra all-parked launch runs after the wave dies (parked
            # lanes sit at DEAD_ORIGIN outside every AABB — box-free).
            if pending is not None and si % check_every == 0:
                last_alive = int(pending)
                if last_alive == 0:
                    break
            pending = n_alive
        sums, rays = finish_wave(state, pix)
        if accum is not None:
            sums, rays = _accum_sums(accum[0], accum[1], sums, rays)
        return sums, rays

    def read_back(acc):
        """(sums, rays) device pair -> the runner's standard dict."""
        sums = np.asarray(acc[0])
        return {
            "radiance": np.ascontiguousarray(sums[0:3].T),
            "normal": np.ascontiguousarray(sums[3:6].T),
            "albedo": np.ascontiguousarray(sums[6:9].T),
            "rays": float(acc[1]),
        }

    def run(seed, num_samples):
        """One wave of min(num_samples, spw) samples; sums like the
        megakernel runner."""
        return read_back(run_dev(seed, num_samples))

    run.run_dev = run_dev
    run.read_back = read_back
    run.chunk_hint = cap
    run.samples_per_wave = cap
    # multichip: sums cover num_samples x ndev samples per call
    run.effective_multiplier = mesh.devices.size if mesh is not None else 1
    run.n_tiles = n_tiles
    run.steps = steps
    run.sort_mode = sort_mode   # resolved (incl. env knobs): sessions
    run.init_mode = init_mode   # and tests can assert the active config
    run.sort_gran = sort_gran
    run.sub_gate = sub_gate
    run.sort_prefix = sort_prefix
    run.kernel_step = kernel_step  # diagnostics: step one launch and
    run.n_pad = n_pad              # inspect state rows (e.g. WROW_KEY
    run.tile = tile                # tag-bit histograms on-chip)
    run.init_state = init_state
    run.finish_wave = finish_wave
    return run
