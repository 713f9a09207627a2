"""Round-4 TPU session W: invariant attribute-select elision A/B.

_LazyAttr (pallas_path.py) elides the brute-unroll attribute selects
that are provably no-ops at kernel-build time (most records share one
material family, so ~13 of the ~18 per-record selects write the value
the lane already holds). r4u measured cornell's unroll at 67% of the
kernel pre-fusion; post-fusion the select chains are roughly half the
remaining unroll body, so the predicted win is ~10-25% on the
architectural scenes.

  W0 cornell @1024 elide ON (default)   sustained Mrays/s
  W1 cornell @1024 elide OFF            the r4v baseline re-run (A/B)
  W2 veach  @720p  elide ON
  W3 veach  @720p  elide OFF

CPU-validated before queueing: elide on/off interpret renders are
BIT-identical on cornell/sphere/veach (test_attr_elide_render_parity);
Mosaic lowering export-checks pass with elision on.

Usage: timeout 7200 python scripts/tpu_session_r4w.py [W0 W1 W2 W3]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4u import cornell_abs  # noqa: E402
from tpu_session_r4v import veach_abs  # noqa: E402


def with_elide(el, fn):
    prev = os.environ.get("RENE_ATTR_ELIDE")
    os.environ["RENE_ATTR_ELIDE"] = el
    try:
        fn()
    finally:
        if prev is None:
            os.environ.pop("RENE_ATTR_ELIDE", None)
        else:
            os.environ["RENE_ATTR_ELIDE"] = prev


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["W0", "W1", "W2", "W3"]
    if "W0" in todo:
        guard("W0", lambda: with_elide(
            "1", lambda: cornell_abs("W.W0 cornell ELIDED", "")))
    if "W1" in todo:
        guard("W1", lambda: with_elide(
            "0", lambda: cornell_abs("W.W1 cornell eager", "")))
    if "W2" in todo:
        guard("W2", lambda: with_elide(
            "1", lambda: veach_abs("W.W2 veach ELIDED")))
    if "W3" in todo:
        guard("W3", lambda: with_elide(
            "0", lambda: veach_abs("W.W3 veach eager")))


if __name__ == "__main__":
    main()
