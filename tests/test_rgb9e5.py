"""RGB9E5 shared-exponent atlas packing (ops/rgb9e5.py)."""
import numpy as np

from rene_tpu.ops import rgb9e5


def test_roundtrip_relative_error():
    rng = np.random.default_rng(3)
    # log-uniform HDR range + LDR values
    v = np.exp(rng.uniform(np.log(1e-4), np.log(6e4), (4096, 3)))
    q = rgb9e5.quantize(v.astype(np.float32))
    maxc = v.max(axis=-1, keepdims=True)
    # absolute error bounded by half a mantissa step of the shared scale
    assert np.all(np.abs(q - v) <= maxc / 511.0)


def test_quantize_idempotent_and_encode_stable():
    rng = np.random.default_rng(4)
    v = rng.random((2048, 3)).astype(np.float32) * 100.0
    q = rgb9e5.quantize(v)
    # the grid is a fixed point: quantize∘quantize == quantize
    np.testing.assert_array_equal(rgb9e5.quantize(q), q)
    # and re-encoding quantized values is bit-stable (pack_scene relies
    # on this: device.py quantizes, pack_scene re-encodes losslessly)
    np.testing.assert_array_equal(rgb9e5.encode(q), rgb9e5.encode(q))
    np.testing.assert_array_equal(rgb9e5.decode(rgb9e5.encode(q)), q)


def test_edge_cases():
    v = np.array([[0, 0, 0], [1, 1, 1], [65408, 0.5, 0],
                  [-3, 0.25, np.nan], [np.inf, 1e-30, 2.0 ** -30]],
                 np.float32)
    q = rgb9e5.quantize(v)
    assert np.all(np.isfinite(q))
    np.testing.assert_array_equal(q[0], [0, 0, 0])
    np.testing.assert_array_equal(q[1], [1, 1, 1])  # 256 * 2^-8 exact
    assert q[2, 0] == 65408.0
    assert q[3, 0] == 0.0 and np.isclose(q[3, 1], 0.25)
    assert q[4, 0] == 65408.0 and q[4, 1] == 0.0
    # 8-bit LDR values (n/255 rounded through srgb degamma floats) stay
    # within one grid step of themselves
    ldr = (np.arange(256, dtype=np.float32) / 255.0)[:, None].repeat(3, 1)
    ql = rgb9e5.quantize(ldr)
    assert np.max(np.abs(ql - ldr)) <= 1.0 / 511.0
