"""Padded Owen-scrambled Sobol sampler (ops/sobol.py) numerical tests."""
import jax.numpy as jnp
import numpy as np

from rene_tpu.ops import sobol as S


def _unit(bits):
    return np.asarray(bits).astype(np.uint32) * (1.0 / 2**32)


def test_base_sequence_is_a_02_net():
    """First 2^k unscrambled points: every elementary interval of area
    2^-k contains exactly one point (the defining (0,k,2)-net
    property), for all interval shapes j1+j2=k."""
    k = 8
    idx = jnp.arange(1 << k, dtype=jnp.uint32)
    u = _unit(S.reverse32(idx))
    v = _unit(S.sobol2_16(idx))
    for j1 in range(k + 1):
        j2 = k - j1
        cells = (np.floor(u * (1 << j1)).astype(int) * (1 << j2)
                 + np.floor(v * (1 << j2)).astype(int))
        counts = np.bincount(cells, minlength=1 << k)
        assert counts.max() == 1 and counts.min() == 1, (j1, j2)


def test_owen_scramble_preserves_the_net():
    k = 8
    idx = jnp.arange(1 << k, dtype=jnp.uint32)
    for key in (7, 123456789):
        u, v = S.ld2_bits(idx, jnp.uint32(key))
        u, v = _unit(u), _unit(v)
        for j1 in range(k + 1):
            j2 = k - j1
            cells = (np.floor(u * (1 << j1)).astype(int) * (1 << j2)
                     + np.floor(v * (1 << j2)).astype(int))
            counts = np.bincount(cells, minlength=1 << k)
            assert counts.max() == 1 and counts.min() == 1, (key, j1, j2)


def test_scramble_uniform_and_pads_decorrelated():
    """Distinct keys must re-pair the pads: the dim-2 values across
    keys decorrelate (the dim-1 vdC values stay rank-correlated for
    ANY Owen-class construction — every scramble/shuffle of the vdC
    dimension composes into one tree automorphism — which is why the
    JOINT coverage is what the integration test below checks)."""
    idx = jnp.arange(4096, dtype=jnp.uint32)
    u1, v1 = S.ld2_bits(idx, jnp.uint32(11))
    u2, v2 = S.ld2_bits(idx, jnp.uint32(12))
    a, b = _unit(v1), _unit(v2)
    assert abs(a.mean() - 0.5) < 0.02 and abs(b.mean() - 0.5) < 0.02
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.06
    # joint 2D coverage across pads: (u1, u2) fills a 16x16 grid
    g = (np.floor(_unit(u1) * 16).astype(int) * 16
         + np.floor(_unit(u2) * 16).astype(int))
    occupancy = np.bincount(g, minlength=256) > 0
    assert occupancy.mean() > 0.95, occupancy.mean()
    # and a key reproduces itself
    u3, _ = S.ld2_bits(idx, jnp.uint32(11))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u3))


def test_sobol_beats_independent_on_integration():
    """RMSE of integrating a smooth 2D function with 256 samples:
    scrambled Sobol must beat iid uniform by at least 3x."""
    f = lambda x, y: np.sin(3 * x) * (y ** 2) + x  # noqa: E731
    ref = (-(np.cos(3) - 1) / 3) * (1 / 3) + 0.5
    n, trials = 256, 64
    idx = jnp.arange(n, dtype=jnp.uint32)
    errs_s, errs_i = [], []
    rng = np.random.default_rng(0)
    for t in range(trials):
        u, v = S.ld2_bits(idx, jnp.uint32(1000 + t))
        errs_s.append(f(_unit(u), _unit(v)).mean() - ref)
        x = rng.random((2, n))
        errs_i.append(f(x[0], x[1]).mean() - ref)
    rmse_s = np.sqrt(np.mean(np.square(errs_s)))
    rmse_i = np.sqrt(np.mean(np.square(errs_i)))
    assert rmse_s * 3.0 < rmse_i, (rmse_s, rmse_i)
