"""Round-4 TPU session F: per-sub-block MT gating (SUB_GATE) A/B.

r4a E7 proved dragon mega's marginal cost is ~100% MT unrolls, and r4e
exhausted the knob space around the current march: under MEMBER_FORI an
entered member cluster runs MT on ALL 128 tris — the SUB_TRIS sub-boxes
only tighten the member-entry flag. SUB_GATE (new, pallas_path) wraps
each sub-block's MT unroll in its own lax.cond keyed on a scalar flag
chain, restoring the old non-MEMBER_FORI gating at N_SUB MT copies.
CPU-parity-tested (test_sub_gate_matches) + Mosaic-export-checked.

  FB dragon mega @720p SUB_TRIS=16 gate OFF — in-session anchor
     (r4e E0: 0.109).
  F1 dragon mega @720p SUB_TRIS {16, 8} gate ON — with real per-sub
     gating, finer sub-boxes now cut MT work, not just entry flags.
  F0 (off by default) dragon SUB_TRIS=4: the _sub_split lane-budget
     clamp makes it identical to SUB_TRIS=8 at CLUSTER=128 (n_sub caps
     at 16), so the r4e sweep is already complete at 8 — kept only as
     a no-crash check of commit 5e2addf.
  TB teapot wave @720p DEFAULT stack gate OFF — anchor (r4e EB 0.590).
  T1 teapot wave @720p gate ON — D2 profile says steps 1-3 (the sorted
     marches) are 66% of wave time; gating attacks their MT share.
  T2 teapot wave @720p gate ON + sub_tris=16 — r4e E1 rejected 16
     without gating; gating may flip it.

Usage: timeout 14400 python scripts/tpu_session_r4f.py [FB F1 ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["FB", "F1", "TB", "T1", "T2"]

    dragon = None
    if any(e in todo for e in ("FB", "F1", "F0")):
        dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
    teapot = None
    if any(e in todo for e in ("TB", "T1", "T2")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    def mega(tag, st, gate):
        old_st, old_g = pp.SUB_TRIS, pp.SUB_GATE
        pp.SUB_TRIS, pp.SUB_GATE = st, gate
        try:
            measure(f"F.{tag} dragon mega @720p SUB_TRIS={st} "
                    f"gate={'ON' if gate else 'off'}",
                    dragon, spp_a=2, spp_b=6, reps=2)
        finally:
            pp.SUB_TRIS, pp.SUB_GATE = old_st, old_g

    def wave(tag, gate, **kw):
        old_g = pp.SUB_GATE
        pp.SUB_GATE = gate
        try:
            reps(f"F.{tag} teapot wave @720p "
                 f"gate={'ON' if gate else 'off'} {kw}",
                 build(teapot, samples_per_wave=8, **kw), 8)
        finally:
            pp.SUB_GATE = old_g

    if "FB" in todo:
        guard("FB", lambda: mega("FB", 16, False))
    if "F1" in todo:
        def f1():
            mega("F1a", 16, True)
            mega("F1b", 8, True)
        guard("F1", f1)
    if "F0" in todo:
        def f0():
            mega("F0a", 4, True)
            mega("F0b", 4, False)
        guard("F0", f0)
    if "TB" in todo:
        guard("TB", lambda: wave("TB", False))
    if "T1" in todo:
        guard("T1", lambda: wave("T1", True))
    if "T2" in todo:
        guard("T2", lambda: wave("T2", True, sub_tris=16))


if __name__ == "__main__":
    main()
