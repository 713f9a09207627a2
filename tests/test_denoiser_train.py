"""U-Net denoiser training: untrained net ties the à-trous base, loss
decreases on synthetic pairs, trained net beats identity, weights
roundtrip through save/load."""
import numpy as np
import pytest

from rene_tpu.models.denoise import UNetDenoiser, atrous_denoise
from rene_tpu.models.train_denoiser import synthetic_pairs, train


def test_untrained_net_equals_atrous():
    noisy, normal, albedo, clean, base = synthetic_pairs(1, seed=5)
    net = UNetDenoiser(features=8)
    out = net(noisy[0], normal[0], albedo[0])
    np.testing.assert_allclose(
        out, atrous_denoise(noisy[0], normal[0], albedo[0]), atol=1e-6)


@pytest.mark.slow
def test_train_reduces_loss_and_beats_identity(tmp_path):
    data = synthetic_pairs(24, seed=3)
    net, losses = train(data, steps=200, batch=8, features=8,
                        seed=1, lr=2e-3, log_every=0)
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.75 * first, (first, last)

    # held-out patch: trained output closer to clean than the noisy input
    noisy, normal, albedo, clean, base = synthetic_pairs(2, seed=99)
    out = net(noisy[0], normal[0], albedo[0])
    mse_out = np.mean((out - clean[0]) ** 2)
    mse_in = np.mean((noisy[0] - clean[0]) ** 2)
    assert mse_out < mse_in

    # save/load roundtrip reproduces the output bit-exactly
    path = str(tmp_path / "w.msgpack")
    net.save(path)
    net2 = UNetDenoiser.load(path)
    out2 = net2(noisy[0], normal[0], albedo[0])
    np.testing.assert_allclose(out, out2, atol=1e-6)
